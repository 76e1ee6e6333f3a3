/* Minimal libgtextutils stand-in: the canonical find_first_not_of /
 * find_first_of tokenizer (consecutive delimiters collapse; no empty
 * tokens are produced).  Surface used by fastx_uncollapser.cpp:150.
 */
#ifndef FASTX_TPU_SHIM_STRING_TOKENIZE_H
#define FASTX_TPU_SHIM_STRING_TOKENIZE_H

#include <string>

template <typename OutputIterator>
void String_Tokenize(const std::string &str, OutputIterator out,
                     const std::string &delimiters = " \t") {
    std::string::size_type last_pos = str.find_first_not_of(delimiters, 0);
    std::string::size_type pos = str.find_first_of(delimiters, last_pos);
    while (pos != std::string::npos || last_pos != std::string::npos) {
        *out = str.substr(last_pos, pos - last_pos);
        ++out;
        last_pos = str.find_first_not_of(delimiters, pos);
        pos = str.find_first_of(delimiters, last_pos);
    }
}

#endif
