/*
 * LinearAlgebraBasic.cpp
 *
 *  Created on: Jun 16, 2016
 *      Author: zhengqi
 */

#include <cassert>
#include "LinearAlgebraBasic.h"

namespace EGriceLab {
namespace Math {
using namespace Eigen;


} /* namespace Math */
} /* namespace EGriceLab */
