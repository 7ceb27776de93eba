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

#include "util/rng.hpp"
#include "util/enums.hpp"
#include "terrain/biomeFuncs.hpp"

// getStratifiedMaterialThickness + shouldGenerateCaveAtBlock, extracted
// verbatim from src/terrain/chunk.cu by build.sh:
#include "extracted_chunk.inc"

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

    if (argc < 5)
    {
        fprintf(stderr, "need CX CZ OUT\n");
        return 2;
    }
    ivec2 chunkPos(atoi(argv[2]), atoi(argv[3]));
    FILE *f = fopen(argv[4], "wb");

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
