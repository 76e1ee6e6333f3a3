/* Minimal libgtextutils stand-in: join an iterator range with a
 * delimiter.  Included by fastx_uncollapser.cpp:34; the only call sites
 * (:168,:175) are inside an #if 0 block, but the header must parse.
 */
#ifndef FASTX_TPU_SHIM_CONTAINER_JOIN_H
#define FASTX_TPU_SHIM_CONTAINER_JOIN_H

#include <sstream>
#include <string>

template <typename InputIterator>
std::string join(InputIterator first, InputIterator last,
                 const std::string &delimiter) {
    std::ostringstream os;
    for (InputIterator it = first; it != last; ++it) {
        if (it != first)
            os << delimiter;
        os << *it;
    }
    return os.str();
}

#endif
