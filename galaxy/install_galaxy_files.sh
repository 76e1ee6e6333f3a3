#!/bin/sh
# Install the fastx_toolkit_tpu Galaxy integration into a Galaxy tree.
# Mirrors the reference's install_galaxy_files.sh.
#
# usage: ./install_galaxy_files.sh /path/to/galaxy-dist

GALAXY_DIR="$1"
if [ -z "$GALAXY_DIR" ] || [ ! -d "$GALAXY_DIR/tools" ]; then
	echo "usage: $0 GALAXY_ROOT   (GALAXY_ROOT must contain a tools/ dir)" >&2
	exit 1
fi
HERE="$(cd "$(dirname "$0")" && pwd)"

mkdir -p "$GALAXY_DIR/tools/fastx_toolkit_tpu"
cp "$HERE"/tools/fastx_toolkit_tpu/*.xml "$GALAXY_DIR/tools/fastx_toolkit_tpu/"
cp "$HERE"/fastx_barcode_splitter_galaxy_wrapper.py "$GALAXY_DIR/tools/fastx_toolkit_tpu/"
cp "$HERE"/fastx_toolkit_tpu_conf.xml "$GALAXY_DIR/"
mkdir -p "$GALAXY_DIR/tool-data"
cp "$HERE"/tool-data/fastx_clipper_sequences.txt "$GALAXY_DIR/tool-data/" 2>/dev/null
mkdir -p "$GALAXY_DIR/test-data"
cp "$HERE"/test-data/* "$GALAXY_DIR/test-data/" 2>/dev/null
mkdir -p "$GALAXY_DIR/static/fastx_icons"
cp "$HERE"/static/fastx_icons/* "$GALAXY_DIR/static/fastx_icons/" 2>/dev/null

echo "Installed. Add fastx_toolkit_tpu_conf.xml to tool_config_file in galaxy.yml."
echo "Functional-test fixtures and goldens are in test-data/ (generated +"
echo "reference-verified by galaxy/make_test_data.py)."
