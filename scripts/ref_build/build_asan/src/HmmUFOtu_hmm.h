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
 * HmmUFOtu_hmm.h
 * HmmUFOtu project HMM header files
 *  Created on: Jan 10, 2017
 *      Author: zhengqi
 */

#ifndef SRC_HMMUFOTU_HMM_H_
#define SRC_HMMUFOTU_HMM_H_

#include "BandedHMMP7Bg.h"
#include "BandedHMMP7Prior.h"
#include "BandedHMMP7.h"
#include "CSFMIndex.h"

#endif /* SRC_HMMUFOTU_HMM_H_ */
