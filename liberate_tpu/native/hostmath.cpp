// Native host math for parameter generation.
//
// The reference's native layer is CUDA compute kernels; this framework's
// compute path is JAX/XLA on TPU, so the native layer instead accelerates
// the host-side runtime: NTT-friendly prime search (deterministic
// Miller-Rabin) and twiddle-bank generation (psi power series), which are
// Python-bigint bound at logN >= 16 (128 primes x 131072 modmuls).
// (reference equivalents: src/liberate/fhe/context/generate_primes.py,
// ckks_context.py:48-112 — pure Python there, precomputed into shipped
// pickles.)
//
// Plain C ABI, loaded with ctypes; all moduli < 2^62 so unsigned __int128
// products never overflow.

#include <cstdint>

extern "C" {

static inline uint64_t mulmod_u64(uint64_t a, uint64_t b, uint64_t q) {
    return (uint64_t)(((unsigned __int128)a * b) % q);
}

uint64_t powmod_u64(uint64_t a, uint64_t e, uint64_t q) {
    uint64_t r = 1 % q;
    a %= q;
    while (e) {
        if (e & 1) r = mulmod_u64(r, a, q);
        a = mulmod_u64(a, a, q);
        e >>= 1;
    }
    return r;
}

// Deterministic Miller-Rabin, exact for all n < 2^64.
static const uint64_t WITNESSES[12] = {2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37};
static const uint64_t SMALL_PRIMES[15] = {2, 3, 5, 7, 11, 13, 17, 19, 23, 29, 31, 37, 41, 43, 47};

int32_t miller_rabin_u64(uint64_t n) {
    if (n < 2) return 0;
    for (int i = 0; i < 15; ++i) {
        if (n == SMALL_PRIMES[i]) return 1;
        if (n % SMALL_PRIMES[i] == 0) return 0;
    }
    uint64_t d = n - 1;
    int r = 0;
    while ((d & 1) == 0) { d >>= 1; ++r; }
    for (int i = 0; i < 12; ++i) {
        uint64_t x = powmod_u64(WITNESSES[i], d, n);
        if (x == 1 || x == n - 1) continue;
        int composite = 1;
        for (int j = 0; j < r - 1; ++j) {
            x = mulmod_u64(x, x, n);
            if (x == n - 1) { composite = 0; break; }
        }
        if (composite) return 0;
    }
    return 1;
}

// Next/previous prime q with q = 1 (mod M), stepping by 2 from `start`
// (start must be odd). Returns 0 if the search leaves (2, 2^63).
uint64_t find_ntt_prime(uint64_t start, uint64_t M, int32_t up) {
    uint64_t q = start;
    while (q > 2 && q < (1ULL << 63)) {
        if ((q - 1) % M == 0 && miller_rabin_u64(q)) return q;
        if (up) q += 2; else q -= 2;
    }
    return 0;
}

// psi power banks in bit-reversed order (reference: ckks_context.py:71-104):
// out_fwd[c][i] = psi_c ^ bitrev(i, logN) mod q_c, likewise inverse.
void psi_banks(const uint64_t* qs, const uint64_t* psis,
               const uint64_t* ipsis, int32_t C, int32_t logN,
               uint64_t* out_fwd, uint64_t* out_inv) {
    const int64_t N = 1LL << logN;
    for (int32_t c = 0; c < C; ++c) {
        const uint64_t q = qs[c];
        const uint64_t psi = psis[c];
        const uint64_t ipsi = ipsis[c];
        uint64_t* fwd = out_fwd + (int64_t)c * N;
        uint64_t* inv = out_inv + (int64_t)c * N;
        // Power series in natural order, scattered to bit-reversed index.
        uint64_t acc = 1, iacc = 1;
        for (int64_t i = 0; i < N; ++i) {
            // bit-reverse i
            uint64_t r = 0, x = (uint64_t)i;
            for (int32_t b = 0; b < logN; ++b) { r = (r << 1) | (x & 1); x >>= 1; }
            fwd[r] = acc;
            inv[r] = iacc;
            acc = mulmod_u64(acc, psi, q);
            iacc = mulmod_u64(iacc, ipsi, q);
        }
    }
}

// Primitive 2N-th root search (reference: ckks_context.py:20-28): raise
// candidates x = 2,3,... to the (q-1)/2N power; return the first whose
// N-th power is not 1.
uint64_t primitive_root_2N(uint64_t q, uint64_t N) {
    uint64_t K = (q - 1) / (2 * N);
    uint64_t g = 0;
    uint64_t limit = N > 3 ? N : 3;
    for (uint64_t x = 2; x < limit; ++x) {
        g = powmod_u64(x, K, q);
        if (powmod_u64(g, N, q) != 1) break;
    }
    return g;
}

// ChaCha20 keystream blocks (counter mode), for host-side stochastic
// rounding and host mirrors of the device CSPRNG
// (reference: src/liberate/csprng/chacha20_cuda_kernel.cu).
static inline uint32_t rotl32(uint32_t x, int n) {
    return (x << n) | (x >> (32 - n));
}

#define QR(a, b, c, d)                                       \
    a += b; d ^= a; d = rotl32(d, 16);                        \
    c += d; b ^= c; b = rotl32(b, 12);                        \
    a += b; d ^= a; d = rotl32(d, 8);                         \
    c += d; b ^= c; b = rotl32(b, 7);

void chacha20_blocks(const uint32_t* key, const uint32_t* nonce,
                     const uint64_t* counters, int64_t n_blocks,
                     uint32_t* out) {
    static const uint32_t CONST[4] = {0x61707865, 0x3320646e,
                                      0x79622d32, 0x6b206574};
    for (int64_t b = 0; b < n_blocks; ++b) {
        uint32_t s[16];
        for (int i = 0; i < 4; ++i) s[i] = CONST[i];
        for (int i = 0; i < 8; ++i) s[4 + i] = key[i];
        s[12] = (uint32_t)(counters[b] & 0xffffffffu);
        s[13] = (uint32_t)(counters[b] >> 32);
        s[14] = nonce[0];
        s[15] = nonce[1];
        uint32_t x[16];
        for (int i = 0; i < 16; ++i) x[i] = s[i];
        for (int r = 0; r < 10; ++r) {
            QR(x[0], x[4], x[8], x[12]);
            QR(x[1], x[5], x[9], x[13]);
            QR(x[2], x[6], x[10], x[14]);
            QR(x[3], x[7], x[11], x[15]);
            QR(x[0], x[5], x[10], x[15]);
            QR(x[1], x[6], x[11], x[12]);
            QR(x[2], x[7], x[8], x[13]);
            QR(x[3], x[4], x[9], x[14]);
        }
        uint32_t* o = out + b * 16;
        for (int i = 0; i < 16; ++i) o[i] = x[i] + s[i];
    }
}

// MXU-NTT table digit decomposition (liberate_tpu/ntt/mxu_ntt.py
// _decompose_table): for each data-digit weight v, fold 2^{8v} into the
// table mod q and emit dA BALANCED base-256 digits per entry (exact
// carry propagation). Python-bigint bound at logN >= 15 (the silver
// master build is ~40 s in numpy-object math, platinum ~12 min); this
// is the same exact integer arithmetic in __int128. Returns the number
// of entries whose digits did not terminate (must be 0).
int64_t mxu_decompose(const uint64_t* M, int64_t O, int64_t I, uint64_t q,
                      int32_t dA, int32_t dB, int32_t centered,
                      int8_t* digits, int64_t* rowsum) {
    // digits layout: [dA, O, dB, I]; rowsum: [dA, O] (sum of raw digits,
    // caller multiplies by 128). centered: decompose the CENTERED
    // representative in (-q/2, q/2] instead of [0, q) — one fewer
    // balanced digit for just-over-a-power-of-256 moduli (the 40-bit
    // scale primes need 5 digits centered vs 6 canonical; same result
    // mod q since table entries shift by multiples of q).
    int64_t errors = 0;
    for (int64_t u = 0; u < (int64_t)dA * O; ++u) rowsum[u] = 0;
    for (int32_t v = 0; v < dB; ++v) {
        uint64_t w = powmod_u64(2, 8 * (uint64_t)v, q);
        for (int64_t o = 0; o < O; ++o) {
            for (int64_t i = 0; i < I; ++i) {
                uint64_t xu = mulmod_u64(M[o * I + i], w, q);
                int64_t x = (centered && xu > q / 2)
                    ? (int64_t)xu - (int64_t)q : (int64_t)xu;
                for (int32_t u = 0; u < dA; ++u) {
                    int32_t d = (int32_t)(x & 0xFF);
                    x >>= 8;   // arithmetic: x may be negative
                    if (d > 127) { d -= 256; x += 1; }
                    digits[(((int64_t)u * O + o) * dB + v) * I + i] =
                        (int8_t)d;
                    rowsum[(int64_t)u * O + o] += d;
                }
                if (x != 0) ++errors;
            }
        }
    }
    return errors;
}

// Shoup multiplier precompute: wp[i] = floor(w[i] * 2^64 / q). Exact in
// unsigned __int128; used for the Pallas kernels' constant-multiplier
// twiddle path (liberate_tpu/ntt/pallas_ntt.py, config.use_shoup_twiddles).
void shoup_precompute(const uint64_t* w, int64_t n, uint64_t q,
                      uint64_t* wp) {
    for (int64_t i = 0; i < n; ++i) {
        wp[i] = (uint64_t)(((unsigned __int128)w[i] << 64) / q);
    }
}

}  // extern "C"
