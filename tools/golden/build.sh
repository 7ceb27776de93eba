#!/bin/sh
# Build the golden generator against the read-only reference mount.
# Extracts the two pure __device__ helpers from chunk.cu verbatim (so the
# golden logic is the reference's own code, not a transcription), then
# compiles golden_gen.cpp with the CUDA-shim stubs shadowing cuda/cudaUtils.hpp.
set -e
REF="${REF:-/root/reference}"
HERE="$(cd "$(dirname "$0")" && pwd)"
OUT="${1:-$HERE/golden_gen}"

test -d "$REF/src" || { echo "reference not mounted at $REF" >&2; exit 1; }

sed -n '/^__device__ float getStratifiedMaterialThickness/,/^}/p' \
    "$REF/src/terrain/chunk.cu" > "$HERE/extracted_chunk.inc"
sed -n '/^__device__ bool shouldGenerateCaveAtBlock/,/^}/p' \
    "$REF/src/terrain/chunk.cu" >> "$HERE/extracted_chunk.inc"

# fill/feature/decorator stages, extracted verbatim (Chunk:: methods renamed to
# the minimal GoldenChunk struct declared in golden_gen.cpp — same member names)
CU="$REF/src/terrain/chunk.cu"
{
  sed -n '/^bool isFeaturePos/,/^}/p' "$CU"
  sed -n '/^__device__ void chunkFillPlaceBlock/,/^}/p' "$CU"
  sed -n '/^static const std::array<ivec2, 49> gatherFeaturePlacementsChunkOffsets/,/^};/p' "$CU"
  # tryGenerateCaveFeaturePlacement falls off the end when isFeaturePos fails
  # (UB, chunk.cu:1027-1038).  g++ -O2 exploits that UB and DELETES the
  # isFeaturePos check (assuming the fall-through unreachable), which placed a
  # cave feature in EVERY eligible column (~15k/7x7 vs ~1k real).  The shipped
  # reference is MSVC host code, where the fall-through materializes as
  # "return false" (eax holds isFeaturePos's 0) — make that explicit.
  sed -n '/^bool Chunk::tryGenerateCaveFeaturePlacement/,/^}/p' "$CU" \
    | sed '$ s/^}$/    return false;\n}/'
  sed -n '/^void Chunk::generateColumnFeaturePlacements/,/^}/p' "$CU"
  sed -n '/^void Chunk::generateFeaturePlacements/,/^}/p' "$CU"
  sed -n '/^void Chunk::fixBackwardStratifiedLayers/,/^}/p' "$CU"
  sed -n '/^void heightBoundsMinMax/,/^}/p' "$CU"
  sed -n '/^void Chunk::tryPlaceSingleDecorator/,/^}/p' "$CU"
  sed -n '/^void Chunk::placeDecorators/,/^}/p' "$CU"
} | sed -e 's/Chunk::/GoldenChunk::/' -e 's/thrust::random::/thrust::/' \
    > "$HERE/extracted_fill.inc"

# -ffp-contract=off: keep f32 expression results stable (no host FMA fusion);
# the reference device build uses fast math, so goldens are "reference logic
# at IEEE f32" — tests compare with documented epsilons.
# -fno-builtin: keep every sin call a real symbol reference so the
# correctly-rounded sinf override in golden_gen.cpp intercepts ALL of them
# (gcc would otherwise fold/transform sinf through its builtin knowledge).
g++ -O2 -std=c++17 -ffp-contract=off -fno-builtin \
    -I "$HERE/stubs" -I "$HERE" -I "$REF/src" -I "$REF/external/include" \
    "$HERE/golden_gen.cpp" -o "$OUT"
echo "built $OUT"
