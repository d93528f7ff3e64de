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
 * HmmUFOtu.h
 *  Created on: Oct 22, 2015
 *      Author: zhengqi
 */

#ifndef HMMUFOTU_H_
#define HMMUFOTU_H_

#include "HmmUFOtu_common.h"
#include "HmmUFOtu_hmm.h"
#include "HmmUFOtu_phylo.h"
#include "HmmUFOtu_OTU.h"

#include "EGMath.h"
#include "EGUtil.h"

#endif /* HMMUFOTU_H_ */
