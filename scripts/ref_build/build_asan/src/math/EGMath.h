/*
 * EGMath.h
 *  Created on: Jun 16, 2016
 *      Author: zhengqi
 */

#ifndef SRC_MATH_EGMATH_H_
#define SRC_MATH_EGMATH_H_

#include "LinearAlgebraBasic.h"
#include "Stats.h"
#include "DirichletModel.h"
#include "DirichletDensity.h"
#include "DirichletMixture.h"
#include "RootFinder.h"

#endif /* SRC_MATH_EGMATH_H_ */
