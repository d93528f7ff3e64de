/*
 * CSLoc.cpp
 *
 *  Created on: Aug 9, 2017
 *      Author: zhengqi
 */

#include "CSLoc.h"

namespace EGriceLab {
namespace HmmUFOtu {

} /* namespace HmmUFOtu */
} /* namespace EGriceLab */
