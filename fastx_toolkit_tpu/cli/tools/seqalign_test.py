"""seqalign_test — manual smoke test of the alignment engine.

Reference: /root/reference/src/seqalign_test/seqalign_test.cpp (aligns
fixed strings, prints the DP matrix and the results).
"""

from __future__ import annotations

import sys

from ...kernels import align
from ..common import CliContext
from .. import common


def tool_main(ctx: CliContext, argv) -> int:
    query, target = b"AAAGGTTTCCC", b"AGGCTT"
    ctx.stdout_text.write(align.format_matrix(query, target))
    ctx.stdout_text.write(align.format_results(query, target))
    return 0


def main():
    sys.exit(common.run_tool_main(tool_main))


if __name__ == "__main__":
    main()
