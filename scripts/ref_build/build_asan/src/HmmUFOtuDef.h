/*******************************************************************************
 * This file is part of HmmUFOtu, an HMM and Phylogenetic placement
 * based tool for Ultra-fast taxonomy assignment and OTU organization
 * of microbiome sequencing data with species level accuracy.
 * Copyright (C) 2017  Qi Zheng
 *
 * HmmUFOtu is free software: you can redistribute it and/or modify
 * it under the terms of the GNU General Public License as published by
 * the Free Software Foundation, either version 3 of the License, or
 * (at your option) any later version.
 *
 * HmmUFOtu is distributed in the hope that it will be useful,
 * but WITHOUT ANY WARRANTY; without even the implied warranty of
 * MERCHANTABILITY or FITNESS FOR A PARTICULAR PURPOSE.  See the
 * GNU General Public License for more details.
 *
 * You should have received a copy of the GNU General Public License
 * along with AlignerBoost.  If not, see <http://www.gnu.org/licenses/>.
 *******************************************************************************/
/*
 * HmmUFOtuDef.h
 *
 *  Created on: Oct 26, 2015
 *      Author: zhengqi
 */

#ifndef HMMUFOTUDEF_H_
#define HMMUFOTUDEF_H_
#ifndef INT8_MAX
#define INT8_MAX (127)
#endif

#ifndef UINT16_MAX
#define UINT16_MAX (65535)
#endif

#ifndef UINT8_MAX
#define UINT8_MAX (255)
#endif

namespace EGriceLab {

typedef unsigned char uchar_t;

}


#endif /* HMMUFOTUDEF_H_ */
