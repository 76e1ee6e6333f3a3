#!/usr/bin/env python3
"""Galaxy wrapper for the barcode splitter.

Reference behavior: /root/reference/galaxy/tools/fastx_toolkit/
fastx_barcode_splitter_galaxy_wrapper.sh — Galaxy can't model a variable
number of outputs, so the splitter's summary table is converted into an
HTML page of links to the per-barcode files (README:214-256).

usage: fastx_barcode_splitter_galaxy_wrapper.py BARCODE_FILE FASTQ_FILE
       LIBNAME OUTPUT_PATH [splitter args...]
"""

import gzip
import html
import io
import os
import re
import sys


def main():
    if len(sys.argv) < 5:
        print("Usage: %s BARCODE_FILE FASTQ_FILE LIBNAME OUTPUT_PATH [...]"
              % sys.argv[0], file=sys.stderr)
        return 1
    barcode_file, fastq_file, libname, output_path = sys.argv[1:5]
    extra = sys.argv[5:]

    for p, what in ((barcode_file, "barcodes file"), (fastq_file, "sequences file")):
        if not os.path.exists(p):
            print("Error: %s (%s) not found" % (what, p), file=sys.stderr)
            return 1
    os.makedirs(output_path, exist_ok=True)

    # sanitize the library name like the shell wrapper (non-alnum -> _)
    libname = re.sub(r"[^a-zA-Z0-9]", "_", libname)
    basepath = output_path.rstrip("/") + "/"
    prefix = basepath + libname + "__"
    suffix = ".txt"

    with open(fastq_file, "rb") as f:
        head = f.read(2)
        f.seek(0)
        data = gzip.open(f).read() if head == b"\x1f\x8b" else f.read()

    from fastx_toolkit_tpu.scripts import barcode_splitter

    out = io.StringIO()
    status = barcode_splitter.main_io(
        ["--bcfile", barcode_file, "--prefix", prefix, "--suffix", suffix] + extra,
        io.BytesIO(data), out, sys.stderr,
    )
    if status != 0:
        print("error")
        return status

    # summary table -> HTML with local paths replaced by links
    print("<html><body><table border=1>")
    for line in out.getvalue().splitlines():
        cells = line.split("\t")
        if cells and cells[-1].startswith(basepath):
            target = cells[-1][len(basepath):]
            cells[-1] = '<a href="%s">%s</a>' % (html.escape(target), html.escape(target))
        print("<tr><td>")
        print("</td><td>".join(cells))
        print("</td></tr>")
    print("<p><b>Copy these files to your local computer, as they will be soon deleted.</b>")
    print("</table></body></html>")
    return 0


if __name__ == "__main__":
    sys.exit(main())
