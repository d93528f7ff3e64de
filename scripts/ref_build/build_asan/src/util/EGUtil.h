/*
 * EGUtil.h
 *
 *  Created on: Nov 28, 2017
 *      Author: zhengqi
 */

#ifndef EGUTIL_H_
#define EGUTIL_H_

#include "ProgLog.h"
#include "VersionSequence.h"
#include "CommandOptions.h"
#include "StringUtils.h"
#include "TSVScanner.h"
#include "TSVRecord.h"
#include "ProgEnv.h"

#endif /* EGUTIL_H_ */
