// Host-compile shim shadowing the reference's src/cuda/cudaUtils.hpp.
//
// The golden generator (tools/golden/golden_gen.cpp) compiles the reference's
// *pure* terrain functions (src/util/rng.hpp, src/terrain/biomeFuncs.hpp) with
// plain g++ to emit golden arrays for block-exactness tests.  Those headers
// reach CUDA only through this include, so shadowing it (via -I order) is all
// that is needed: CUDA keywords become no-ops, __constant__ tables become
// ordinary globals, and cudaMemcpyToSymbol becomes memcpy.
//
// NOTE: this file intentionally does NOT reproduce CUBuffer or any reference
// code — it is a stub interface, not a copy.
#pragma once

#define __host__
#define __device__
#define __global__
#define __constant__
#define __forceinline__ inline

#include <cstring>
#include <cstddef>
#include <vector>

#define GLM_ENABLE_EXPERIMENTAL 1
#include <glm/glm.hpp>
#include <glm/gtc/noise.hpp>
#include <glm/gtx/component_wise.hpp>

using namespace glm;

#include <thrust/random.h>

// cudaMemcpyToSymbol(symbol, src, bytes) -> host memcpy into the plain global.
template <class T>
inline void cudaMemcpyToSymbol(T &symbol, const void *src, size_t bytes)
{
    std::memcpy((void *)&symbol, src, bytes);
}

namespace CudaUtils
{
inline void checkCUDAError(const char *, int = -1) {}
} // namespace CudaUtils
