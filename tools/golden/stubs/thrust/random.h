// Minimal host stand-in for <thrust/random.h> covering exactly what the
// reference's terrain code uses: thrust::default_random_engine (minstd_rand,
// the linear_congruential_engine<uint32,48271,0,2^31-1>) and
// thrust::uniform_real_distribution / uniform_int_distribution.
//
// Semantics follow thrust's documented behavior:
//  - seeding: state = seed % m, replaced by the default seed 1 when it lands
//    on 0 (linear_congruential_engine with c == 0),
//  - operator(): state' = 48271 * state mod (2^31 - 1),
//  - uniform_real_distribution<RealType>(a, b): maps a draw x via
//    (x - min) / (max - min) in [0, 1] then scales to [a, b]
//    (min = 1, max = m - 1 for minstd).
// These are the same semantics mega_minecraft_tpu/ops/hashes.py implements.
#pragma once

#include <cstdint>

namespace thrust
{

class minstd_rand
{
public:
    using result_type = std::uint32_t;
    static constexpr result_type multiplier = 48271u;
    static constexpr result_type modulus = 2147483647u; // 2^31 - 1
    static constexpr result_type default_seed = 1u;
    static constexpr result_type min = 1u;
    static constexpr result_type max = modulus - 1u;

    explicit minstd_rand(result_type seed = default_seed) { this->seed(seed); }

    void seed(result_type s)
    {
        m_state = s % modulus;
        if (m_state == 0u)
            m_state = default_seed;
    }

    result_type operator()()
    {
        m_state = (result_type)(((std::uint64_t)m_state * multiplier) % modulus);
        return m_state;
    }

    void discard(unsigned long long n)
    {
        while (n--)
            (*this)();
    }

private:
    result_type m_state;
};

using default_random_engine = minstd_rand;

template <class RealType = float>
class uniform_real_distribution
{
public:
    uniform_real_distribution(RealType a = RealType(0), RealType b = RealType(1))
        : m_a(a), m_b(b)
    {
    }

    template <class Engine>
    RealType operator()(Engine &eng)
    {
        RealType u = RealType(eng() - Engine::min) / RealType(Engine::max - Engine::min);
        return m_a + (m_b - m_a) * u;
    }

private:
    RealType m_a, m_b;
};

template <class IntType = int>
class uniform_int_distribution
{
public:
    uniform_int_distribution(IntType a = 0, IntType b = 9)
        : m_a(a), m_b(b)
    {
    }

    template <class Engine>
    IntType operator()(Engine &eng)
    {
        // thrust maps through uniform_real over [a, b+1)
        float u = float(eng() - Engine::min) / float(Engine::max - Engine::min);
        IntType v = m_a + (IntType)(u * (float)(m_b - m_a + 1));
        return v > m_b ? m_b : v;
    }

private:
    IntType m_a, m_b;
};

} // namespace thrust
