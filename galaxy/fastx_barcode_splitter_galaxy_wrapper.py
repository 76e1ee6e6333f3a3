#!/usr/bin/env python3
"""Galaxy wrapper for the barcode splitter.

Reference behavior: /root/reference/galaxy/tools/fastx_toolkit/
fastx_barcode_splitter_galaxy_wrapper.sh — Galaxy can't model a variable
number of outputs, so the splitter's summary table is converted into an
HTML page of links to the per-barcode files (README:214-256).  Output is
byte-identical to the shell wrapper (tested differentially in
tests/test_scripts.py).

usage: fastx_barcode_splitter_galaxy_wrapper.py BARCODE_FILE FASTQ_FILE
       LIBNAME OUTPUT_PATH [splitter args...]
"""

import gzip
import io
import os
import re
import sys


def main():
    # wrapper.sh:28-31,40-43 — both the first and the fourth positional
    # must be present
    argv = sys.argv[1:]
    if not argv or argv[0] == "" or len(argv) < 4 or argv[3] == "":
        print("Usage: %s [BARCODE FILE] [FASTQ FILE] [LIBRARY_NAME] [OUTPUT_PATH]"
              % sys.argv[0], file=sys.stderr)
        return 1
    barcode_file, fastq_file, libname, output_path = argv[:4]
    extra = argv[4:]

    # sanitize the library name (wrapper.sh:46-48): strip .gz then .txt
    # suffix, then DELETE every non-alphanumeric character
    if libname.endswith(".gz"):
        libname = libname[: -len(".gz")]
    if libname.endswith(".txt"):
        libname = libname[: -len(".txt")]
    libname = re.sub(r"[^a-zA-Z0-9]", "", libname)

    if not os.path.exists(fastq_file):
        print("Error: Input file (%s) not found!" % fastq_file, file=sys.stderr)
        return 1
    if not os.path.exists(barcode_file):
        print("Error: barcode file (%s) not found!" % barcode_file, file=sys.stderr)
        return 1
    os.makedirs(output_path, exist_ok=True)

    basepath = output_path.rstrip("/") + "/"
    prefix = basepath + libname + "__"
    suffix = ".txt"

    # gzip -cdf: decompress if gzipped, pass through otherwise
    with open(fastq_file, "rb") as f:
        head = f.read(2)
        f.seek(0)
        data = gzip.open(f).read() if head == b"\x1f\x8b" else f.read()

    from fastx_toolkit_tpu.core.errors import FastxError
    from fastx_toolkit_tpu.scripts import barcode_splitter

    out = io.StringIO()
    try:
        status = barcode_splitter.main_io(
            ["--bcfile", barcode_file, "--prefix", prefix, "--suffix", suffix]
            + extra,
            io.BytesIO(data), out, sys.stderr,
        )
    except FastxError as e:
        sys.stderr.write(str(e))
        status = e.status
    if status != 0:
        # wrapper.sh:72-74 prints "error" but does NOT exit — the HTML
        # skeleton below still renders (with an empty table row)
        print("error")

    # summary table -> HTML with local paths replaced by links
    # (wrapper.sh:79-89: echo | sed; `echo` of an empty capture still
    # emits one blank line, hence the [''] fallback)
    print("<html><body><table border=1>")
    lines = out.getvalue().splitlines() or [""]
    for line in lines:
        m = re.search(re.escape(basepath) + "(.*)", line)
        if m:
            line = line[: m.start()] + '<a href="%s">%s</a>' % (m.group(1), m.group(1))
        cells = line.split("\t")
        print("<tr><td>")
        print("</td><td>".join(cells))
        print("</td></tr>")
    print("<p>")
    print("</table></body></html>")
    return 0


if __name__ == "__main__":
    sys.exit(main())
