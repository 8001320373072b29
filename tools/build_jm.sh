#!/bin/sh
# Build the JM 18.5 reference encoder/decoder as conformance oracles.
#
# Copies the (read-only) reference JM tree into the gitignored .jm/ scratch
# dir, normalizes line endings (unixprep.sh), and builds lencod.exe/ldecod.exe
# with -fcommon (JM predates gcc-10's -fno-common default).
#
# Usage: tools/build_jm.sh   -> binaries at .jm/JM/bin/{lencod,ldecod}.exe
set -e
REPO="$(cd "$(dirname "$0")/.." && pwd)"
SRC="/root/reference/4.对比程序/jm18.5/JM"
DST="$REPO/.jm/JM"

if [ -x "$DST/bin/ldecod.exe" ] && [ -x "$DST/bin/lencod.exe" ]; then
    echo "JM oracles already built: $DST/bin"
    exit 0
fi

[ -d "$SRC" ] || { echo "reference JM tree not found: $SRC" >&2; exit 1; }
mkdir -p "$REPO/.jm"
cp -r "$SRC" "$REPO/.jm/"
chmod -R u+w "$DST"
cd "$DST"
sh unixprep.sh >/dev/null 2>&1 || true
make -C ldecod clean >/dev/null 2>&1 || true
make -C lencod clean >/dev/null 2>&1 || true
make ldecod -j"$(nproc)" CFLAGS='-fcommon' >/dev/null
make lencod -j"$(nproc)" CFLAGS='-fcommon' >/dev/null
echo "JM oracles built: $DST/bin/lencod.exe $DST/bin/ldecod.exe"
