/* Minimal jsoncpp-compatible shim for building the reference
 * hmmufotu-jplace tool (the image has no jsoncpp).  Covers exactly
 * the subset hmmufotu-jplace.cpp uses: Json::Value with string/int
 * indexing, append(), scalar assignment, and ostream output.  Output
 * is valid JSON with alphabetically-ordered object members (matching
 * jsoncpp's std::map storage); whitespace differs from jsoncpp's
 * StyledWriter, which is irrelevant for semantic jplace comparison.
 */
#ifndef JSON_SHIM_H
#define JSON_SHIM_H

#include <cstdio>
#include <map>
#include <ostream>
#include <sstream>
#include <string>
#include <vector>

namespace Json {

class Value {
public:
	enum Type { nullValue, intValue, realValue, stringValue,
		booleanValue, arrayValue, objectValue };

	Value() : type_(nullValue), int_(0), real_(0), bool_(false) {}
	Value(const char* s) : type_(stringValue), int_(0), real_(0),
		bool_(false), str_(s) {}
	Value(const std::string& s) : type_(stringValue), int_(0),
		real_(0), bool_(false), str_(s) {}
	Value(double d) : type_(realValue), int_(0), real_(d),
		bool_(false) {}
	Value(int i) : type_(intValue), int_(i), real_(0), bool_(false) {}
	Value(long i) : type_(intValue), int_(i), real_(0), bool_(false) {}
	Value(long long i) : type_(intValue), int_(i), real_(0),
		bool_(false) {}
	Value(unsigned long i) : type_(intValue),
		int_(static_cast<long long>(i)), real_(0), bool_(false) {}
	Value(bool b) : type_(booleanValue), int_(0), real_(0),
		bool_(b) {}

	Value& operator[](const std::string& key) {
		become(objectValue);
		return obj_[key];
	}
	Value& operator[](const char* key) {
		return (*this)[std::string(key)];
	}
	Value& operator[](int idx) {
		become(arrayValue);
		if (idx >= static_cast<int>(arr_.size()))
			arr_.resize(idx + 1);
		return arr_[idx];
	}
	Value& append(const Value& v) {
		become(arrayValue);
		arr_.push_back(v);
		return arr_.back();
	}

	void write(std::ostream& os) const {
		switch (type_) {
		case nullValue: os << "null"; break;
		case booleanValue: os << (bool_ ? "true" : "false"); break;
		case intValue: os << int_; break;
		case realValue: {
			char buf[32];
			std::snprintf(buf, sizeof(buf), "%.17g", real_);
			os << buf;
			break;
		}
		case stringValue: writeString(os, str_); break;
		case arrayValue: {
			os << "[";
			for (size_t i = 0; i < arr_.size(); ++i) {
				if (i) os << ",";
				arr_[i].write(os);
			}
			os << "]";
			break;
		}
		case objectValue: {
			os << "{";
			bool first = true;
			for (std::map<std::string, Value>::const_iterator it =
					obj_.begin(); it != obj_.end(); ++it) {
				if (!first) os << ",";
				first = false;
				writeString(os, it->first);
				os << ":";
				it->second.write(os);
			}
			os << "}";
			break;
		}
		}
	}

private:
	void become(Type t) {
		if (type_ == nullValue)
			type_ = t;
	}
	static void writeString(std::ostream& os, const std::string& s) {
		os << '"';
		for (size_t i = 0; i < s.size(); ++i) {
			unsigned char c = s[i];
			switch (c) {
			case '"': os << "\\\""; break;
			case '\\': os << "\\\\"; break;
			case '\n': os << "\\n"; break;
			case '\r': os << "\\r"; break;
			case '\t': os << "\\t"; break;
			default:
				if (c < 0x20) {
					char buf[8];
					std::snprintf(buf, sizeof(buf), "\\u%04x", c);
					os << buf;
				} else {
					os << s[i];
				}
			}
		}
		os << '"';
	}

	Type type_;
	long long int_;
	double real_;
	bool bool_;
	std::string str_;
	std::vector<Value> arr_;
	std::map<std::string, Value> obj_;
};

inline std::ostream& operator<<(std::ostream& os, const Value& v) {
	v.write(os);
	return os;
}

} /* namespace Json */

#endif /* JSON_SHIM_H */
