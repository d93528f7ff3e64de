// Minimal filtering_istream/ostream: a std::iostream wrapper whose
// push() accepts file_source/file_sink/std streams.  No compression
// filters (HAVE_LIBZ stays undefined in the shim build).
#ifndef SHIM_BOOST_IOSTREAMS_FILTERING_STREAM_HPP
#define SHIM_BOOST_IOSTREAMS_FILTERING_STREAM_HPP
#include <fstream>
#include <iostream>
#include <memory>
#include <string>
#include "device/file.hpp"

namespace boost {
namespace iostreams {

class filtering_istream : public std::istream {
 public:
    filtering_istream() : std::istream(nullptr) {}
    void push(const file_source& src) {
        fb_.reset(new std::filebuf());
        fb_->open(src.path(), std::ios::in | std::ios::binary);
        if (fb_->is_open())
            rdbuf(fb_.get());
        else
            setstate(std::ios::failbit);
    }
    void push(std::istream& in) { rdbuf(in.rdbuf()); }
    bool is_complete() const { return rdbuf() != nullptr; }
    void reset() { rdbuf(nullptr); fb_.reset(); }
 private:
    std::unique_ptr<std::filebuf> fb_;
};

class filtering_ostream : public std::ostream {
 public:
    filtering_ostream() : std::ostream(nullptr) {}
    void push(const file_sink& sink) {
        fb_.reset(new std::filebuf());
        fb_->open(sink.path(), std::ios::out | std::ios::binary
                               | std::ios::trunc);
        if (fb_->is_open())
            rdbuf(fb_.get());
        else
            setstate(std::ios::failbit);
    }
    void push(std::ostream& out) { rdbuf(out.rdbuf()); }
    bool is_complete() const { return rdbuf() != nullptr; }
    void reset() { flush(); rdbuf(nullptr); fb_.reset(); }
 private:
    std::unique_ptr<std::filebuf> fb_;
};

}
}
#endif
