/* Minimal libgtextutils stand-in for compiling the two reference tools
 * that need it (fastx_uncollapser.cpp:31-34, fasta_formatter.cpp:26-27)
 * for the differential test harness.  Fresh implementation of just the
 * surface those tools touch: construct with a filename ("" = stdio) and
 * expose the stream.
 */
#ifndef FASTX_TPU_SHIM_STREAM_WRAPPER_H
#define FASTX_TPU_SHIM_STREAM_WRAPPER_H

#include <err.h>

#include <fstream>
#include <iostream>
#include <string>

class InputStreamWrapper {
    std::ifstream file_;
    bool use_stdin_;

public:
    explicit InputStreamWrapper(const std::string &filename)
        : use_stdin_(filename.empty()) {
        if (!use_stdin_) {
            file_.open(filename.c_str());
            if (!file_)
                err(1, "failed to open input file '%s'", filename.c_str());
        }
    }
    std::istream &stream() { return use_stdin_ ? std::cin : file_; }
};

class OutputStreamWrapper {
    std::ofstream file_;
    bool use_stdout_;

public:
    explicit OutputStreamWrapper(const std::string &filename)
        : use_stdout_(filename.empty()) {
        if (!use_stdout_) {
            file_.open(filename.c_str());
            if (!file_)
                err(1, "failed to create output file '%s'", filename.c_str());
        }
    }
    std::ostream &stream() { return use_stdout_ ? std::cout : file_; }
};

#endif
