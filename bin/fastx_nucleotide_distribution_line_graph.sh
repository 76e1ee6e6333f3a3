#!/usr/bin/env python3
import os, sys
sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))
from fastx_toolkit_tpu.scripts.nucleotide_distribution import main_line
main_line()
