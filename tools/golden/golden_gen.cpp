// Golden-value generator for block-exactness tests.
//
// Compiles the REFERENCE'S OWN pure terrain functions (read-only mount at
// /root/reference: src/util/rng.hpp noise/hash library, src/terrain/biomeFuncs.hpp
// biome noise/weights/heights + data tables, and two __device__ functions
// extracted verbatim from src/terrain/chunk.cu by build.sh) with plain g++,
// then drives them per column/block exactly like the reference kernels do:
//   - kernGenerateHeightfield (chunk.cu:150-185): per-column biome noise ->
//     24 weights -> height
//   - kernGenerateLayers (chunk.cu:322-419): 18x18 heightfield tile, slope,
//     material weights, forward/backward/eroded layer starts
//   - kernGenerateCaves (chunk.cu:812-940): per-block cave test, flip
//     compaction into CaveLayer runs, cave biomes at run boundaries
//
// Output is raw little-endian arrays; tools/golden/generate.py wraps them into
// tests/golden/*.npz for pytest.  This file contains NO terrain math of its
// own — only the kernel launch-geometry loops.
//
// Build: tools/golden/build.sh  (requires /root/reference mounted)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cfloat>
#include <string>
#include <vector>

// Hash sin: overrides libm's sinf for this whole binary (build.sh compiles
// with -fno-builtin, so every float sin in the reference headers — glm
// componentwise sin included — resolves to this symbol instead of glibc's
// ~1.5%-misrounded sinf).  This is an OP-FOR-OP C twin of the JAX side's
// ops/hashes._sin_cr (double-single Cody–Waite reduction + Taylor through
// r^15): both sides execute the IDENTICAL sequence of IEEE f32 add/sub/mul
// (-ffp-contract=off here; XLA:TPU evaluates the traced ops one rounding
// each), so every sin-dot hash draw is BIT-EQUAL by construction — including
// the ~3e-5 of draws where the double-single result differs from true
// correctly-rounded sin (the round-3 residual that still displaced features
// in 17/49 chunks when this override was `(float)::sin((double)x)`).
// tools/sin_twin_check.py pins the bit-equality over the placement-seed range.
// CAVEAT (twin-vs-twin, not an independent oracle): a bug introduced into
// _sin_cr would reproduce identically here and stay invisible to every golden
// and placement diff.  The guard against that drift is the INDEPENDENT
// accuracy gate tests/test_ops.py::test_sin_cr_placement_seed_range, which
// checks _sin_cr against float64 sin (mismatch rate < 1e-4) — keep it green
// whenever either twin changes.
#include <cmath>
namespace sincr {
static const float SPLIT = 4097.0f;  // Dekker split constant for f32 (2^12+1)
static const float PI_HI = 3.1415927410125732f;
static const float PI_MED = -8.742277657347586e-08f;
static const float PI_LO = -3.4302490200117637e-15f;
static const float INVPI_HI = 0.31830987334251404f;
static const float INVPI_LO = 1.2841276486597053e-08f;
// c15 .. c3 (Horner from the highest power), double-single pairs
static const float C_HI[7] = {
    -7.647163609812713e-13f, 1.6059044372074283e-10f, -2.5052107943679403e-08f,
    2.7557318844628753e-06f, -0.00019841270113829523f, 0.008333333767950535f,
    -0.1666666716337204f};
static const float C_LO[7] = {
    -1.2200710471178288e-20f, -5.352526511562726e-18f, -4.4176230446483665e-16f,
    3.793571224297229e-14f, 2.725596874933456e-12f, -4.34617203337595e-10f,
    4.967053879312289e-09f};

static inline void two_prod(float a, float b, float& p, float& e) {
    p = a * b;
    float aa = a * SPLIT, ah = aa - (aa - a), al = a - ah;
    float bb = b * SPLIT, bh = bb - (bb - b), bl = b - bh;
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl;
}
static inline void two_sum(float a, float b, float& s, float& e) {
    s = a + b;
    float v = s - a;
    e = (a - (s - v)) + (b - v);
}
static inline void ds_mul(float ah, float al, float bh, float bl, float& s, float& t) {
    float p, e;
    two_prod(ah, bh, p, e);
    e = e + (ah * bl + al * bh);
    two_sum(p, e, s, t);
}
static inline void ds_add(float ah, float al, float bh, float bl, float& s2, float& t) {
    float s, e;
    two_sum(ah, bh, s, e);
    e = e + al + bl;
    two_sum(s, e, s2, t);
}

static inline float sin_cr(float d) {
    // quadrant k = round(d/pi) carried as an exact (k0, k1) pair
    float q_hi, q_e;
    two_prod(d, INVPI_HI, q_hi, q_e);
    float q_lo = q_e + d * INVPI_LO;
    float k0 = rintf(q_hi);                 // jnp.round == rintf (half-to-even)
    float k1 = rintf((q_hi - k0) + q_lo);
    float p1, e1;
    two_prod(k0, PI_HI, p1, e1);
    float s1 = d - p1;                      // exact (Sterbenz)
    float t_hi, t_lo;
    two_sum(s1, -e1, t_hi, t_lo);
    float p1b, e1b;
    two_prod(k1, PI_HI, p1b, e1b);
    float t2;
    two_sum(t_hi, -p1b, t_hi, t2);
    t_lo = t_lo + t2 - e1b;
    float p2, e2;
    two_prod(k0, PI_MED, p2, e2);
    float u_hi, u_lo;
    two_sum(t_hi, -p2, u_hi, u_lo);
    float k = k0 + k1;
    float r_hi, r_lo;
    two_sum(u_hi, u_lo + t_lo - (e2 + k1 * PI_MED + k * PI_LO), r_hi, r_lo);
    // sin(r) = r + r^3 * P(r^2), full double-single Horner
    float r2_hi, r2_lo;
    ds_mul(r_hi, r_lo, r_hi, r_lo, r2_hi, r2_lo);
    float p_hi = C_HI[0], p_lo = C_LO[0];
    for (int i = 1; i < 7; ++i) {
        ds_mul(p_hi, p_lo, r2_hi, r2_lo, p_hi, p_lo);
        ds_add(p_hi, p_lo, C_HI[i], C_LO[i], p_hi, p_lo);
    }
    float r3_hi, r3_lo;
    ds_mul(r2_hi, r2_lo, r_hi, r_lo, r3_hi, r3_lo);
    float th2, tl2;
    ds_mul(r3_hi, r3_lo, p_hi, p_lo, th2, tl2);
    float s_hi, s_lo;
    ds_add(r_hi, r_lo, th2, tl2, s_hi, s_lo);
    float sin_r = s_hi + s_lo;
    bool odd0 = (k0 - 2.0f * floorf(k0 * 0.5f)) != 0.0f;
    bool odd1 = (k1 - 2.0f * floorf(k1 * 0.5f)) != 0.0f;
    return (odd0 != odd1) ? -sin_r : sin_r;
}
}  // namespace sincr
extern "C" float sinf(float x) noexcept { return sincr::sin_cr(x); }

#include "util/rng.hpp"
#include "util/enums.hpp"
#include "terrain/biomeFuncs.hpp"
#include "terrain/featurePlacement.hpp"

// getStratifiedMaterialThickness + shouldGenerateCaveAtBlock, extracted
// verbatim from src/terrain/chunk.cu by build.sh:
#include "extracted_chunk.inc"

// Minimal stand-in for the reference's Chunk (src/terrain/chunk.hpp) with the
// SAME member names/layouts, so the fill/feature/decorator methods extracted
// verbatim by build.sh (extracted_fill.inc, Chunk:: -> GoldenChunk::) compile
// against it unmodified.
struct GoldenChunk
{
    ivec3 worldBlockPos{};
    std::array<float, 256> heightfield{};
    std::array<float, 24 * 256> biomeWeights{};
    std::array<float, 20 * 256> layers{};
    std::array<CaveLayer, 256 * MAX_CAVE_LAYERS_PER_COLUMN> caveLayers{};
    std::vector<FeaturePlacement> featurePlacements;
    std::vector<CaveFeaturePlacement> caveFeaturePlacements;
    std::vector<FeaturePlacement> gatheredFeaturePlacements;
    std::vector<CaveFeaturePlacement> gatheredCaveFeaturePlacements;
    std::array<Block, 16 * 384 * 16> blocks{};

    bool tryGenerateCaveFeaturePlacement(const CaveFeatureGen &caveFeatureGen,
                                         const CaveLayer &caveLayer, bool top,
                                         int caveFeaturePlacementSeed, float rand,
                                         ivec2 worldBlockPos2d);
    void generateColumnFeaturePlacements(int localX, int localZ);
    void generateFeaturePlacements();
    void fixBackwardStratifiedLayers();
    void tryPlaceSingleDecorator(ivec3 pos, const DecoratorGen &gen);
    void placeDecorators();
};

bool isFeaturePos(ivec2 worldBlockPos2d, int gridCellSize, int gridCellPadding, int seed);

#include "extracted_fill.inc"

namespace
{

void writeOrDie(const void *p, size_t n, FILE *f)
{
    if (fwrite(p, 1, n, f) != n)
    {
        fprintf(stderr, "short write\n");
        exit(1);
    }
}

// kernGenerateHeightfield semantics for one column.
void columnHeightfield(vec2 worldPos, float *height, float *weights24)
{
    const auto biomeNoise = getBiomeNoise(worldPos);
    float h = 0.f;
    for (int biomeIdx = 0; biomeIdx < numBiomes; ++biomeIdx)
    {
        Biome biome = (Biome)biomeIdx;
        float weight = getBiomeWeight(biome, biomeNoise);
        if (weight > 0.f)
        {
            h += weight * getHeight(biome, worldPos);
        }
        weights24[biomeIdx] = weight;
    }
    *height = h;
}

// 18x18 heightfield tile (z-major rows, world offsets -1..16) + per-column
// 24 biome weights for the 16x16 core.
void chunkHeightfield(ivec2 chunkPos, float hf18[18 * 18], float weights[24 * 256])
{
    for (int z = -1; z <= 16; ++z)
    {
        for (int x = -1; x <= 16; ++x)
        {
            vec2 worldPos = chunkPos + ivec2(x, z);
            float w24[numBiomes];
            float h;
            columnHeightfield(worldPos, &h, w24);
            hf18[(z + 1) * 18 + (x + 1)] = h;
            if (x >= 0 && x < 16 && z >= 0 && z < 16)
            {
                int idx = posTo2dIndex(x, z);
                for (int b = 0; b < numBiomes; ++b)
                {
                    weights[256 * b + idx] = w24[b];
                }
            }
        }
    }
}

// kernGenerateLayers semantics for one chunk.
void chunkLayers(ivec2 chunkPos, const float hf18[18 * 18],
                 const float weights[24 * 256], float layers[20 * 256])
{
    for (int z = 0; z < 16; ++z)
    {
        for (int x = 0; x < 16; ++x)
        {
            const int idx = posTo2dIndex(x, z);
            const vec2 worldPos = chunkPos + ivec2(x, z);

            float totalMaterialWeights[numMaterials];
            for (int m = 0; m < numMaterials; ++m)
                totalMaterialWeights[m] = 0;
            for (int b = 0; b < numBiomes; ++b)
            {
                const float biomeWeight = weights[256 * b + idx];
                for (int m = 0; m < numMaterials; ++m)
                {
                    totalMaterialWeights[m] +=
                        biomeWeight * dev_biomeMaterialWeights[posTo2dIndex<numMaterials>(m, b)];
                }
            }

            const ivec2 pos18 = ivec2(x + 1, z + 1);
            const float maxHeight = hf18[posTo2dIndex<18>(pos18)];
            float slope = 0;
            for (int i = 0; i < 8; ++i)
            {
                float neighborHeight = hf18[posTo2dIndex<18>(pos18 + dev_dirVecs2d[i])];
                slope = max(slope, abs(neighborHeight - maxHeight) * (i % 2 == 1 ? SQRT_2 : 1));
            }

            float *columnLayers = layers + idx;
            float height = 0;
            for (int layerIdx = 0; layerIdx < numForwardMaterials; ++layerIdx)
            {
                columnLayers[256 * layerIdx] = height;
                if (height > maxHeight || layerIdx == numForwardMaterials - 1)
                    break;
                height += getStratifiedMaterialThickness(layerIdx, totalMaterialWeights[layerIdx], worldPos);
            }
            height = 0;
            for (int layerIdx = numStratifiedMaterials - 1; layerIdx >= numForwardMaterials; --layerIdx)
            {
                height += getStratifiedMaterialThickness(layerIdx, totalMaterialWeights[layerIdx], worldPos);
                columnLayers[256 * layerIdx] = height;
            }
            height = maxHeight;
            for (int layerIdx = numMaterials - 1; layerIdx >= numStratifiedMaterials; --layerIdx)
            {
                const auto &materialInfo = dev_materialInfos[layerIdx];
                float materialWeight = totalMaterialWeights[layerIdx];
                float layerHeight =
                    max(0.f, materialInfo.thickness *
                                 ((materialInfo.noiseScaleOrMaxSlope - slope) / materialInfo.noiseScaleOrMaxSlope)) *
                    materialWeight;
                height -= layerHeight;
                columnLayers[256 * layerIdx] = height;
            }
        }
    }
}

// kernGenerateCaves semantics for one chunk: per-block mask + CaveLayer runs.
void chunkCaves(ivec2 chunkPos, const float hf18[18 * 18], const float weights[24 * 256],
                unsigned char mask[256 * 384], int starts[256 * 32], int ends[256 * 32],
                int bottomBiomes[256 * 32], int topBiomes[256 * 32])
{
    for (int z = 0; z < 16; ++z)
    {
        for (int x = 0; x < 16; ++x)
        {
            const int idx = posTo2dIndex(x, z);
            const float maxHeight = hf18[(z + 1) * 18 + (x + 1)];
            float oceanAndBeachWeight = 0.f;
            for (int b = 0; b < numOceanAndBeachBiomes; ++b)
                oceanAndBeachWeight += weights[256 * b + idx];

            int isFilled[384];
            for (int y = 0; y < 384; ++y)
            {
                ivec3 worldPos = ivec3(chunkPos.x + x, y, chunkPos.y + z);
                bool cave = shouldGenerateCaveAtBlock(worldPos, maxHeight, oceanAndBeachWeight);
                isFilled[y] = cave ? 0 : 1;
                mask[idx * 384 + y] = cave ? 1 : 0;
            }

            // flip compaction (chunk.cu:858-912): alternating start/end heights
            int *cs = starts + idx * 32;
            int *ce = ends + idx * 32;
            int *cb = bottomBiomes + idx * 32;
            int *ct = topBiomes + idx * 32;
            for (int i = 0; i < 32; ++i)
            {
                cs[i] = 384;
                ce[i] = 384;
                cb[i] = 0;
                ct[i] = 0;
            }
            int nFlips = 0;
            for (int y = 0; y < 384 && nFlips < 64; ++y)
            {
                int isNextFilled = y < 383 ? isFilled[y + 1] : 0;
                if (isFilled[y] != isNextFilled)
                {
                    if ((nFlips & 1) == 0)
                        cs[nFlips >> 1] = y;
                    else
                        ce[nFlips >> 1] = y;
                    ++nFlips;
                }
            }
            const ivec2 worldBlockPos2d = chunkPos + ivec2(x, z);
            for (int i = 0; i < 32; ++i)
            {
                if (cs[i] != 384)
                    cb[i] = (int)getCaveBiome(ivec3(worldBlockPos2d.x, cs[i], worldBlockPos2d.y), maxHeight, 329271348);
                if (ce[i] == 384)
                    ct[i] = (int)CaveBiome::NONE;
                else
                    ct[i] = (int)getCaveBiome(ivec3(worldBlockPos2d.x, ce[i] + 1, worldBlockPos2d.y), maxHeight, 4982921);
            }
        }
    }
}

// Zone erosion (kernDoErosion + Chunk::erodeZone host loop, chunk.cu:473-723):
// 24x24-chunk gathered grid of 8 eroded-layer starts + heightfield, relaxed
// top layer first by synchronous Jacobi sweeps until the did-change flag stays
// clear.  Reproduces the reference's literal semantics: accumulatedHeights
// folded into reads ONLY on each layer's first iteration (isFirst,
// chunk.cu:507,551), writes gated on maxThickness > 0 over the 3x3
// neighborhood (chunk.cu:578), newStart clamped to the layer end, neighbor
// reads clamped at the grid border (chunk.cu:545).  One kernel launch loads
// per-block snapshots before relaxing, so a launch IS one Jacobi step; the
// converged fixed point is schedule-independent (monotone operator).
void erodeGrid(float *G /* [9][384*384] */)
{
    constexpr int N = 384; // EROSION_GRID_SIDE_LENGTH_BLOCKS (terrain.hpp:18)
    constexpr int NC = N * N;
    std::vector<float> A(NC, 0.f), S(NC), E(NC);

    for (int l = numErodedMaterials - 1; l >= 0; --l)
    {
        const float tanRepose =
            dev_materialInfos[numStratifiedMaterials + l].noiseAmplitudeOrTanAngleOfRepose;
        bool first = true;
        bool changedAny;
        do
        {
            changedAny = false;
            for (int i = 0; i < NC; ++i)
            {
                const float a = first ? A[i] : 0.f;
                S[i] = G[l * NC + i] + a;
                E[i] = G[(l + 1) * NC + i] + a;
            }
            for (int z = 0; z < N; ++z)
            {
                for (int x = 0; x < N; ++x)
                {
                    const int i = z * N + x;
                    float ns = S[i];
                    float maxTh = E[i] - S[i];
                    for (int d = 0; d < 8; ++d)
                    {
                        ivec2 nb = clamp(ivec2(x, z) + dev_dirVecs2d[d], 0, N - 1);
                        const int j = nb.y * N + nb.x;
                        ns = max(ns, S[j] - tanRepose * (d % 2 == 1 ? SQRT_2 : 1.f));
                        maxTh = max(maxTh, E[j] - S[j]);
                    }
                    ns = min(ns, E[i]);
                    if (maxTh > 0)
                    {
                        G[l * NC + i] = ns;
                        if (ns != S[i])
                        {
                            A[i] += ns - S[i];
                            changedAny = true;
                        }
                    }
                }
            }
            first = false;
        } while (changedAny);
    }
}

// kernFill launch semantics for one chunk (chunk.cu:1379-1510: per-column
// shared arrays, per-block RNG, base fill then gathered feature loops) plus
// Chunk::fill's gathered height bounds and MAX-capacity truncation + NONE
// sentinel (chunk.cu:1546-1602).
void fillChunk(GoldenChunk &c)
{
    ivec2 allFeaturesHeightBounds = ivec2(384, -1);
    for (const auto &fp : c.gatheredFeaturePlacements)
    {
        const auto &b = host_featureHeightBounds[(int)fp.feature];
        heightBoundsMinMax(allFeaturesHeightBounds, ivec2(fp.pos.y) + b);
    }
    ivec2 allCaveFeaturesHeightBounds = ivec2(384, -1);
    for (const auto &cfp : c.gatheredCaveFeaturePlacements)
    {
        const auto &b = host_caveFeatureHeightBounds[(int)cfp.feature];
        heightBoundsMinMax(allCaveFeaturesHeightBounds,
                           ivec2(cfp.pos.y, cfp.pos.y + cfp.layerHeight) + b);
    }

    std::vector<FeaturePlacement> fps(
        c.gatheredFeaturePlacements.begin(),
        c.gatheredFeaturePlacements.begin() +
            std::min((int)c.gatheredFeaturePlacements.size(), MAX_GATHERED_FEATURES_PER_CHUNK));
    if ((int)fps.size() < MAX_GATHERED_FEATURES_PER_CHUNK)
        fps.push_back({Feature::NONE});
    std::vector<CaveFeaturePlacement> cfps(
        c.gatheredCaveFeaturePlacements.begin(),
        c.gatheredCaveFeaturePlacements.begin() +
            std::min((int)c.gatheredCaveFeaturePlacements.size(), MAX_GATHERED_CAVE_FEATURES_PER_CHUNK));
    if ((int)cfps.size() < MAX_GATHERED_CAVE_FEATURES_PER_CHUNK)
        cfps.push_back({CaveFeature::NONE});

    float shared_biomeWeights[numBiomes];
    float shared_layersAndHeight[numMaterials + 1];
    CaveLayer shared_caveLayers[MAX_CAVE_LAYERS_PER_COLUMN];

    for (int z = 0; z < 16; ++z)
    {
        for (int x = 0; x < 16; ++x)
        {
            const int idx2d = posTo2dIndex(x, z);
            for (int b = 0; b < numBiomes; ++b)
                shared_biomeWeights[b] = c.biomeWeights[256 * b + idx2d];
            for (int l = 0; l < numMaterials; ++l)
                shared_layersAndHeight[l] = c.layers[256 * l + idx2d];
            shared_layersAndHeight[numMaterials] = c.heightfield[idx2d];
            for (int i = 0; i < MAX_CAVE_LAYERS_PER_COLUMN; ++i)
                shared_caveLayers[i] = c.caveLayers[idx2d * MAX_CAVE_LAYERS_PER_COLUMN + i];
            const float height = shared_layersAndHeight[numMaterials];

            for (int y = 0; y < 384; ++y)
            {
                const ivec3 worldBlockPos = c.worldBlockPos + ivec3(x, y, z);
                auto rng = makeSeededRandomEngine(worldBlockPos.x, worldBlockPos.y, worldBlockPos.z);

                Block block;
                chunkFillPlaceBlock(&block, shared_biomeWeights, shared_layersAndHeight,
                                    shared_caveLayers, y, height, worldBlockPos, rng);

                const bool isInFeatureBounds =
                    y >= allFeaturesHeightBounds[0] && y <= allFeaturesHeightBounds[1];
                const bool isInCaveFeatureBounds =
                    y >= allCaveFeaturesHeightBounds[0] && y <= allCaveFeaturesHeightBounds[1];

                Block featureBlock;
                bool placedFeature = false;
                if (isInFeatureBounds)
                {
                    for (const auto &featurePlacement : fps)
                    {
                        if (featurePlacement.feature == Feature::NONE)
                            break;
                        if (block != Block::AIR && !featurePlacement.canReplaceBlocks)
                            continue;
                        ivec2 b = dev_featureHeightBounds[(int)featurePlacement.feature] + ivec2(featurePlacement.pos.y);
                        if (y < b[0] || y > b[1])
                            continue;
                        if (placeFeature(featurePlacement, worldBlockPos, &featureBlock))
                        {
                            placedFeature = true;
                            break;
                        }
                    }
                }
                if (isInCaveFeatureBounds && !placedFeature)
                {
                    for (const auto &caveFeaturePlacement : cfps)
                    {
                        if (caveFeaturePlacement.feature == CaveFeature::NONE)
                            break;
                        if (block != Block::AIR && !caveFeaturePlacement.canReplaceBlocks)
                            continue;
                        const int fy = caveFeaturePlacement.pos.y;
                        ivec2 b = ivec2(fy, fy + caveFeaturePlacement.layerHeight) +
                                  dev_caveFeatureHeightBounds[(int)caveFeaturePlacement.feature];
                        if (y < b[0] || y > b[1])
                            continue;
                        if (placeCaveFeature(caveFeaturePlacement, worldBlockPos, &featureBlock))
                        {
                            placedFeature = true;
                            break;
                        }
                    }
                }
                if (placedFeature)
                    block = featureBlock;

                c.blocks[posTo3dIndex(x, y, z)] = block;
            }
        }
    }
}

// Primitive-level goldens on a small grid (localizes failures to one primitive).
void emitNoise(FILE *f)
{
    const int N = 48;
    std::vector<float> plane(N * N);
    auto dump = [&](auto fn) {
        for (int j = 0; j < N; ++j)
            for (int i = 0; i < N; ++i)
                plane[j * N + i] = fn(i, j);
        writeOrDie(plane.data(), plane.size() * 4, f);
    };
    dump([](int i, int j) { return glm::simplex(vec2(i * 0.37f - 8.9f, j * 0.53f - 7.1f)); });
    dump([](int i, int j) { return fbm<4>(vec2(i * 0.29f - 5.3f, j * 0.41f - 6.7f)); });
    dump([](int i, int j) { return fbm<5>(vec3(i * 0.31f - 4.9f, j * 0.23f - 3.8f, (i + j) * 0.17f)); });
    dump([](int i, int j) { return worley(vec2(i * 0.43f - 9.2f, j * 0.37f - 8.4f)); });
    dump([](int i, int j) {
        float edge;
        worley(vec2(i * 0.43f - 9.2f, j * 0.37f - 8.4f), nullptr, &edge);
        return edge;
    });
    dump([](int i, int j) { return specialCaveNoise(vec3(i * 0.21f - 4.4f, j * 0.19f - 3.3f, (i * j) * 0.01f)); });
    dump([](int i, int j) { return rand1From2(vec2(i - 23, j - 17)); });
    dump([](int i, int j) {
        auto rng = makeSeededRandomEngine(i, j, 42);
        thrust::uniform_real_distribution<float> u01(0, 1);
        return u01(rng);
    });
    // carve-formula terms at REAL world coordinates of the (592,-368) chunk
    // (mask band mismatch triage): noisePos = world * 0.005, y sweep 0..96
    dump([](int i, int j) {
        vec3 np = vec3((592 + (i % 16)) * 0.005f, (j * 2 + i / 16) * 0.005f, (-368 + (i % 16) + j) * 0.005f);
        return fbm<4>(np * 0.07f);
    });
    dump([](int i, int j) {
        vec3 np = vec3((592 + (i % 16)) * 0.005f, (j * 2 + i / 16) * 0.005f, (-368 + (i % 16) + j) * 0.005f);
        return fbm<4>(np * 4.0f);
    });
    dump([](int i, int j) {
        vec3 np = vec3((592 + (i % 16)) * 0.005f, (j * 2 + i / 16) * 0.005f, (-368 + (i % 16) + j) * 0.005f);
        return fbm3From3<5>(np * 0.8f).x * 1.8f;
    });
    dump([](int i, int j) {
        vec3 np = vec3((592 + (i % 16)) * 0.005f, (j * 2 + i / 16) * 0.005f, (-368 + (i % 16) + j) * 0.005f);
        vec3 off = fbm3From3<5>(np * 0.8f) * 1.8f;
        return specialCaveNoise(np * vec3(1.f, 1.6f, 1.f) + off);
    });
    // specialCaveNoise WITHOUT the fbm offset (pure grid fn, isolates the
    // primitive from offset error propagation)
    dump([](int i, int j) {
        vec3 np = vec3((592 + (i % 16)) * 0.005f, (j * 2 + i / 16) * 0.005f, (-368 + (i % 16) + j) * 0.005f);
        return specialCaveNoise(np * vec3(1.f, 1.6f, 1.f));
    });
    // the y and z components of fbm3From3<5> (x already dumped above)
    dump([](int i, int j) {
        vec3 np = vec3((592 + (i % 16)) * 0.005f, (j * 2 + i / 16) * 0.005f, (-368 + (i % 16) + j) * 0.005f);
        return fbm3From3<5>(np * 0.8f).y * 1.8f;
    });
    dump([](int i, int j) {
        vec3 np = vec3((592 + (i % 16)) * 0.005f, (j * 2 + i / 16) * 0.005f, (-368 + (i % 16) + j) * 0.005f);
        return fbm3From3<5>(np * 0.8f).z * 1.8f;
    });
}

} // namespace

int main(int argc, char **argv)
{
    if (argc < 3)
    {
        fprintf(stderr, "usage: golden_gen <noise OUT | heightfield CX CZ OUT | layers CX CZ OUT | caves CX CZ OUT>\n");
        return 2;
    }
    BiomeUtils::init();

    std::string cmd = argv[1];
    if (cmd == "noise")
    {
        FILE *f = fopen(argv[2], "wb");
        emitNoise(f);
        fclose(f);
        return 0;
    }

    if (cmd == "sinmap")
    {
        // sinmap IN OUT: map a raw-f32 file through this binary's sinf
        // override — tools/sin_twin_check.py diffs it bitwise against the JAX
        // side's ops/hashes._sin_cr to pin the twin's bit-equality
        if (argc < 4) { fprintf(stderr, "sinmap IN OUT\n"); return 2; }
        FILE *fi = fopen(argv[2], "rb"), *fo = fopen(argv[3], "wb");
        if (!fi || !fo) { fprintf(stderr, "sinmap: open failed\n"); return 2; }
        float buf[4096];
        size_t n;
        while ((n = fread(buf, sizeof(float), 4096, fi)) > 0)
        {
            for (size_t i = 0; i < n; ++i) buf[i] = sinf(buf[i]);
            fwrite(buf, sizeof(float), n, fo);
        }
        fclose(fi); fclose(fo);
        return 0;
    }

    if (argc < 5)
    {
        fprintf(stderr, "need CX CZ OUT\n");
        return 2;
    }
    ivec2 chunkPos(atoi(argv[2]), atoi(argv[3]));
    FILE *f = fopen(argv[4], "wb");

    if (cmd == "blockgrid")
    {
        // full fill -> SDF features -> decorators pipeline for the chunk at
        // block (CX, CZ): generates the 7x7 neighborhood (heightfield, layers
        // + backward fixup [skip-erosion semantics, chunk.cu:744-749], caves,
        // feature placements), gathers placements in the reference's 49-offset
        // order, fills the CENTER chunk and decorates it.  Emits the 16x384x16
        // u8 block grid pre- and post-decorators ([z][x][y] after numpy
        // reshape: posTo3dIndex = y + 384*(x + 16*z)).
        static GoldenChunk grid[7][7];
        static float hf18[18 * 18], w[24 * 256];
        static unsigned char mask[256 * 384];
        static int cs[256 * 32], ce[256 * 32], bb[256 * 32], tb[256 * 32];
        for (int j = 0; j < 7; ++j)
        {
            for (int i = 0; i < 7; ++i)
            {
                GoldenChunk &c = grid[j][i];
                const ivec2 cpos = chunkPos + ivec2((i - 3) * 16, (j - 3) * 16);
                c.worldBlockPos = ivec3(cpos.x, 0, cpos.y);
                chunkHeightfield(cpos, hf18, w);
                std::memcpy(c.biomeWeights.data(), w, sizeof(w));
                for (int z = 0; z < 16; ++z)
                    for (int x = 0; x < 16; ++x)
                        c.heightfield[posTo2dIndex(x, z)] = hf18[(z + 1) * 18 + (x + 1)];
                chunkLayers(cpos, hf18, w, c.layers.data());
                c.fixBackwardStratifiedLayers();
                chunkCaves(cpos, hf18, w, mask, cs, ce, bb, tb);
                for (int idx = 0; idx < 256; ++idx)
                {
                    for (int k = 0; k < MAX_CAVE_LAYERS_PER_COLUMN; ++k)
                    {
                        CaveLayer &cl = c.caveLayers[idx * MAX_CAVE_LAYERS_PER_COLUMN + k];
                        cl.start = cs[idx * 32 + k];
                        cl.end = ce[idx * 32 + k];
                        cl.bottomBiome = (CaveBiome)bb[idx * 32 + k];
                        cl.topBiome = (CaveBiome)tb[idx * 32 + k];
                    }
                }
                c.generateFeaturePlacements();
            }
        }
        GoldenChunk &center = grid[3][3];
        // gather order = the reference's spiral offsets (chunk.cu:1160-1171);
        // neighborChunks[centerZ + offset.y][centerX + offset.x]
        for (const auto &offset : gatherFeaturePlacementsChunkOffsets)
        {
            const GoldenChunk &nb = grid[3 + offset.y][3 + offset.x];
            for (const auto &fp : nb.featurePlacements)
                center.gatheredFeaturePlacements.push_back(fp);
            for (const auto &cfp : nb.caveFeaturePlacements)
                center.gatheredCaveFeaturePlacements.push_back(cfp);
        }
        const int nf = (int)center.gatheredFeaturePlacements.size();
        const int ncf = (int)center.gatheredCaveFeaturePlacements.size();
        fillChunk(center);
        writeOrDie(center.blocks.data(), center.blocks.size(), f);
        center.placeDecorators();
        writeOrDie(center.blocks.data(), center.blocks.size(), f);
        // trailer: gathered placement counts (diagnostics for mismatch triage)
        int counts[2] = {nf, ncf};
        writeOrDie(counts, sizeof(counts), f);
        fclose(f);
        return 0;
    }

    if (cmd == "placements")
    {
        // per-chunk placement LISTS for the 7x7 neighborhood of (CX, CZ) —
        // isolates the placement pass from the block-grid application.  For
        // each chunk (row-major j, i): i32 n_surface, then n_surface records
        // of i32[5] {feature, x, y, z, canReplace}; i32 n_cave, then n_cave
        // records of i32[6] {feature, x, y, z, layerHeight, canReplace}.
        static GoldenChunk grid[7][7];
        static float hf18[18 * 18], w[24 * 256];
        static unsigned char mask[256 * 384];
        static int cs[256 * 32], ce[256 * 32], bb[256 * 32], tb[256 * 32];
        for (int j = 0; j < 7; ++j)
        {
            for (int i = 0; i < 7; ++i)
            {
                GoldenChunk &c = grid[j][i];
                const ivec2 cpos = chunkPos + ivec2((i - 3) * 16, (j - 3) * 16);
                c.worldBlockPos = ivec3(cpos.x, 0, cpos.y);
                chunkHeightfield(cpos, hf18, w);
                std::memcpy(c.biomeWeights.data(), w, sizeof(w));
                for (int z = 0; z < 16; ++z)
                    for (int x = 0; x < 16; ++x)
                        c.heightfield[posTo2dIndex(x, z)] = hf18[(z + 1) * 18 + (x + 1)];
                chunkLayers(cpos, hf18, w, c.layers.data());
                c.fixBackwardStratifiedLayers();
                chunkCaves(cpos, hf18, w, mask, cs, ce, bb, tb);
                for (int idx = 0; idx < 256; ++idx)
                {
                    for (int k = 0; k < MAX_CAVE_LAYERS_PER_COLUMN; ++k)
                    {
                        CaveLayer &cl = c.caveLayers[idx * MAX_CAVE_LAYERS_PER_COLUMN + k];
                        cl.start = cs[idx * 32 + k];
                        cl.end = ce[idx * 32 + k];
                        cl.bottomBiome = (CaveBiome)bb[idx * 32 + k];
                        cl.topBiome = (CaveBiome)tb[idx * 32 + k];
                    }
                }
                c.generateFeaturePlacements();
                int n = (int)c.featurePlacements.size();
                writeOrDie(&n, sizeof(n), f);
                for (const auto &fp : c.featurePlacements)
                {
                    int rec[5] = {(int)fp.feature, fp.pos.x, fp.pos.y, fp.pos.z,
                                  fp.canReplaceBlocks ? 1 : 0};
                    writeOrDie(rec, sizeof(rec), f);
                }
                n = (int)c.caveFeaturePlacements.size();
                writeOrDie(&n, sizeof(n), f);
                for (const auto &cfp : c.caveFeaturePlacements)
                {
                    int rec[6] = {(int)cfp.feature, cfp.pos.x, cfp.pos.y, cfp.pos.z,
                                  cfp.layerHeight, cfp.canReplaceBlocks ? 1 : 0};
                    writeOrDie(rec, sizeof(rec), f);
                }
            }
        }
        fclose(f);
        return 0;
    }

    if (cmd == "erosion")
    {
        // 24x24-chunk zone grid whose corner chunk starts at block (CX, CZ);
        // emits the pre-erosion gathered grid then the eroded grid (both
        // [9][384][384] f32, z-major rows; row 8 = heightfield).
        constexpr int N = 384, NC = N * N;
        static std::vector<float> G(9 * NC);
        static float hf18[18 * 18], weights[24 * 256], layers[20 * 256];
        for (int cz = 0; cz < 24; ++cz)
        {
            for (int cx = 0; cx < 24; ++cx)
            {
                const ivec2 cpos = chunkPos + ivec2(cx * 16, cz * 16);
                chunkHeightfield(cpos, hf18, weights);
                chunkLayers(cpos, hf18, weights, layers);
                for (int z = 0; z < 16; ++z)
                {
                    for (int x = 0; x < 16; ++x)
                    {
                        const int gi = (cz * 16 + z) * N + (cx * 16 + x);
                        for (int l = 0; l < numErodedMaterials; ++l)
                        {
                            G[l * NC + gi] =
                                layers[256 * (numStratifiedMaterials + l) + posTo2dIndex(x, z)];
                        }
                        G[8 * NC + gi] = hf18[(z + 1) * 18 + (x + 1)];
                    }
                }
            }
        }
        writeOrDie(G.data(), G.size() * 4, f);
        erodeGrid(G.data());
        writeOrDie(G.data(), G.size() * 4, f);
        fclose(f);
        return 0;
    }

    static float hf18[18 * 18];
    static float weights[24 * 256];
    chunkHeightfield(chunkPos, hf18, weights);

    if (cmd == "heightfield")
    {
        writeOrDie(hf18, sizeof(hf18), f);
        writeOrDie(weights, sizeof(weights), f);
    }
    else if (cmd == "layers")
    {
        static float layers[20 * 256];
        chunkLayers(chunkPos, hf18, weights, layers);
        writeOrDie(layers, sizeof(layers), f);
    }
    else if (cmd == "caves")
    {
        static unsigned char mask[256 * 384];
        static int starts[256 * 32], ends[256 * 32], bb[256 * 32], tb[256 * 32];
        chunkCaves(chunkPos, hf18, weights, mask, starts, ends, bb, tb);
        writeOrDie(mask, sizeof(mask), f);
        writeOrDie(starts, sizeof(starts), f);
        writeOrDie(ends, sizeof(ends), f);
        writeOrDie(bb, sizeof(bb), f);
        writeOrDie(tb, sizeof(tb), f);
    }
    else
    {
        fprintf(stderr, "unknown cmd %s\n", cmd.c_str());
        return 2;
    }
    fclose(f);
    return 0;
}
