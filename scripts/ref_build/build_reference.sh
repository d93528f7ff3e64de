#!/bin/bash
# Build the reference `hmmufotu` assigner (+ -build, needed to
# create a DB; reads come from this framework's simulator) for a MEASURED CPU baseline.
#
# The image has no Boost/Eigen/autoconf (see BASELINE.md); this build
# uses (a) the Eigen headers bundled inside the tensorflow wheel and
# (b) declaration-level Boost shims in ./shim — the reference's own
# source is compiled UNMODIFIED except NewickTree.cpp, whose
# Boost.Spirit parser is replaced by newick_stub.cpp:
#   * `hmmufotu` (the timed binary) never parses Newick text, so its
#     hot path is 100% reference code;
#   * `hmmufotu-build` DOES need the parser, so the stub build of it
#     is replaced by a tiny recursive-descent reader in
#     newick_parse.cpp producing the same NT structure.
#
# Usage: bash scripts/ref_build/build_reference.sh [outdir]
set -e
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT="${1:-$HERE/build}"
EIGEN=/opt/venv/lib/python3.12/site-packages/tensorflow/include
mkdir -p "$OUT/obj"

# Build from a patched COPY of the reference tree (never committed):
# modern Eigen (3.4.90, the TF-bundled copy) rejects HKY85::subDist's
# enum-shadowing locals (`double A` then `D(A,G)` — which old Eigen
# silently truncated to index 0, a latent reference bug off the assign
# path); rename the locals to restore the intended enum indices.
REF="$OUT/src"
mkdir -p "$REF"
cp -ru /root/reference/src/. "$REF/"
chmod -R u+w "$REF"
python3 - "$REF/HKY85.h" <<'PYEOF'
import sys
p = sys.argv[1]
s = open(p).read()
s = s.replace("double A = a * g / (a + g) + c * t / (c + t);",
              "double hkyA = a * g / (a + g) + c * t / (c + t);")
s = s.replace("double B = a * g + c * t;", "double hkyB = a * g + c * t;")
s = s.replace("double C = (a + g) * (c + t);",
              "double hkyC = (a + g) * (c + t);")
s = s.replace("return - 2 * A * ::log(1 - p / (2 * A) - (A - B) * q "
              "/ (2 * A * C));",
              "return - 2 * hkyA * ::log(1 - p / (2 * hkyA) - "
              "(hkyA - hkyB) * q / (2 * hkyA * hkyC));")
open(p, "w").write(s)
PYEOF
# vendored-libcds quirk: WaveletTreeNoptrs reads the input as 32-bit
# words, overreading up to 3 bytes past CSFMIndex's `new uint8_t[N]`
# BWT buffer (caught by ASan; can segfault when N lands on a page
# boundary).  Pad the allocation — byte-identical index contents.
python3 - "$REF/CSFMIndex.cpp" <<'PYEOF'
import sys
p = sys.argv[1]
s = open(p).read()
s = s.replace("uint8_t* X_bwt = new uint8_t[N];",
              "uint8_t* X_bwt = new uint8_t[N + 4];")
open(p, "w").write(s)
PYEOF

CXX=g++
CC=gcc
COMMON_FLAGS="${REFBUILD_FLAGS:--O3 -march=native -mno-avx512fp16 -faligned-new -fopenmp} -w"
INC="-I$HERE/shim -I$EIGEN -I$REF -I$REF/util -I$REF/math \
 -I$REF/libdivsufsort/include -I$REF/libcds/include"
CXXFLAGS="$COMMON_FLAGS -std=c++14 $INC"
CFLAGS="$COMMON_FLAGS -std=gnu99 -DHAVE_CONFIG_H -I$REF/libdivsufsort/include"

cd "$OUT/obj"

compile() {  # compile $1 -> $2.o if missing/outdated
    src="$1"; obj="$(basename "${src%.*}").o"
    if [ ! -f "$obj" ] || [ "$src" -nt "$obj" ]; then
        case "$src" in
            *.c) $CC $CFLAGS -c "$src" -o "$obj" & ;;
            *)   $CXX $CXXFLAGS -c "$src" -o "$obj" & ;;
        esac
        # 2-core box: cap parallel compiles
        while [ "$(jobs -r | wc -l)" -ge 3 ]; do wait -n; done
    fi
}

# vendored native libs (third-party code the reference itself vendors)
for f in "$REF"/libdivsufsort/lib/*.c; do compile "$f"; done
for f in $(find "$REF/libcds/src" -name '*.cpp'); do compile "$f"; done

# util + math + common + hmm + phylo (NewickTree.cpp -> stub)
for f in "$REF"/util/*.cpp "$REF"/math/*.cpp; do compile "$f"; done
for f in DegenAlphabet IUPACNucl IUPACAmino DNA AlphabetFactory \
         PrimarySeq DigitalSeq SeqIO SeqUtils MSA CSLoc \
         BandedHMMP7Bg BandedHMMP7Prior BandedHMMP7 CSFMIndex \
         PhyloTreeUnrooted DNASubModel GTR TN93 HKY85 F81 K80 JC69 \
         DiscreteGammaModel DNASubModelFactory \
         HmmUFOtuEnv HmmUFOtu_main; do
    compile "$REF/$f.cpp"
done
compile "$HERE/newick_stub.cpp"
compile "$HERE/newick_parse.cpp"
for m in hmmufotu hmmufotu-build hmmufotu-jplace; do
    compile "$REF/$m.cpp"
done
wait

LIBOBJS="DegenAlphabet.o IUPACNucl.o IUPACAmino.o DNA.o \
 AlphabetFactory.o PrimarySeq.o DigitalSeq.o SeqIO.o SeqUtils.o MSA.o \
 CSLoc.o BandedHMMP7Bg.o BandedHMMP7Prior.o BandedHMMP7.o CSFMIndex.o \
 PhyloTreeUnrooted.o DNASubModel.o GTR.o TN93.o HKY85.o F81.o K80.o \
 JC69.o DiscreteGammaModel.o DNASubModelFactory.o HmmUFOtuEnv.o \
 $(ls CommandOptions.o ProgEnv.o ProgLog.o StringUtils.o \
      TSVScanner.o TSVRecord.o VersionSequence.o 2>/dev/null) \
 $(for f in "$REF"/math/*.cpp; do basename "${f%.cpp}.o"; done) \
 $(for f in "$REF"/libdivsufsort/lib/*.c; do basename "${f%.c}.o"; done) \
 $(for f in $(find "$REF/libcds/src" -name '*.cpp'); do \
       basename "${f%.cpp}.o"; done)"

$CXX $COMMON_FLAGS -o "$OUT/hmmufotu" hmmufotu.o HmmUFOtu_main.o \
    newick_stub.o $LIBOBJS
$CXX $COMMON_FLAGS -o "$OUT/hmmufotu-build" hmmufotu-build.o \
    newick_parse.o $LIBOBJS
# jplace converter (jsoncpp replaced by shim/json/json.h — output is
# semantically-equal JSON with alphabetic member order)
$CXX $COMMON_FLAGS -o "$OUT/hmmufotu-jplace" hmmufotu-jplace.o \
    HmmUFOtu_main.o newick_stub.o $LIBOBJS
echo "built: $OUT/hmmufotu $OUT/hmmufotu-build $OUT/hmmufotu-jplace"
