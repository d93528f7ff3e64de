#ifndef SHIM_BOOST_IOSTREAMS_DEVICE_FILE_HPP
#define SHIM_BOOST_IOSTREAMS_DEVICE_FILE_HPP
#include <fstream>
#include <string>
namespace boost {
namespace iostreams {

class file_source {
 public:
    explicit file_source(const std::string& p) : path_(p) {
        std::ifstream probe(p.c_str());
        open_ = probe.good();
    }
    bool is_open() const { return open_; }
    const std::string& path() const { return path_; }
 private:
    std::string path_;
    bool open_;
};

class file_sink {
 public:
    explicit file_sink(const std::string& p) : path_(p) {
        std::ofstream probe(p.c_str(), std::ios::app);
        open_ = probe.good();
    }
    bool is_open() const { return open_; }
    const std::string& path() const { return path_; }
 private:
    std::string path_;
    bool open_;
};

}
}
#endif
