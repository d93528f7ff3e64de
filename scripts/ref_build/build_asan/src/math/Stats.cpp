/*
 * Stats.cpp
 *
 *  Created on: Jul 24, 2015
 *      Author: zhengqi
 */

#include "Stats.h"

namespace EGriceLab {
namespace Math {
using namespace std;

} /* namespace Math */
} /* namespace EGriceLab */

