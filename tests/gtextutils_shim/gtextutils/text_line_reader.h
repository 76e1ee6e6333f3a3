/* Minimal libgtextutils stand-in: line reader with std::getline
 * semantics (a final unterminated line is still returned; the line
 * string excludes the newline).  Surface used by
 * fastx_uncollapser.cpp:141-156 and fasta_formatter.cpp:144-174:
 * next_line() / line_string() / line_number().
 */
#ifndef FASTX_TPU_SHIM_TEXT_LINE_READER_H
#define FASTX_TPU_SHIM_TEXT_LINE_READER_H

#include <iostream>
#include <string>

class TextLineReader {
    std::istream &in_;
    std::string line_;
    size_t line_number_;

public:
    explicit TextLineReader(std::istream &in) : in_(in), line_number_(0) {}

    bool next_line() {
        if (!std::getline(in_, line_))
            return false;
        ++line_number_;
        return true;
    }
    const std::string &line_string() const { return line_; }
    size_t line_number() const { return line_number_; }
};

#endif
