// tc_native — host-runtime primitives for threshold_crypto_tpu.
//
// The reference crate links native Rust crates for these exact capabilities
// (SURVEY.md §2b): `tiny-keccak` for SHA3-256 (/root/reference/src/util.rs:3-9)
// and `rand_chacha` 0.2 for the ChaCha20 word stream that drives hash-to-G2
// sampling and the xor_with_hash KDF (/root/reference/src/lib.rs:691-715).
// This library is the TPU framework's native equivalent: the TPU handles the
// batched field/curve/pairing math, and this C++ hot path handles the
// byte-oriented host side (hashing, keystreams, wire codecs) where Python is
// 100-1000x off native speed.  Loaded via ctypes; every entry point has a
// pure-Python fallback (threshold_crypto_tpu/utils/rng.py, hashing.py).
//
// All implementations are from the public specifications (FIPS-202 for
// Keccak, RFC 8439 for the ChaCha20 quarter-round; rand_chacha's word-stream
// framing: 64-bit block counter in state words 12-13, stream id 0 in 14-15).

#include <cstdint>
#include <cstring>
#include <cstddef>

namespace {

// ---------------------------------------------------------------------------
// Keccak-f[1600] and SHA3-256 (FIPS-202).
// ---------------------------------------------------------------------------

constexpr uint64_t kRoundConst[24] = {
    0x0000000000000001ULL, 0x0000000000008082ULL, 0x800000000000808aULL,
    0x8000000080008000ULL, 0x000000000000808bULL, 0x0000000080000001ULL,
    0x8000000080008081ULL, 0x8000000000008009ULL, 0x000000000000008aULL,
    0x0000000000000088ULL, 0x0000000080008009ULL, 0x000000008000000aULL,
    0x000000008000808bULL, 0x800000000000008bULL, 0x8000000000008089ULL,
    0x8000000000008003ULL, 0x8000000000008002ULL, 0x8000000000000080ULL,
    0x000000000000800aULL, 0x800000008000000aULL, 0x8000000080008081ULL,
    0x8000000000008080ULL, 0x0000000080000001ULL, 0x8000000080008008ULL,
};

// rotation offsets r[x][y] laid out by lane index (x + 5y)
constexpr int kRho[25] = {
    0,  1,  62, 28, 27,
    36, 44, 6,  55, 20,
    3,  10, 43, 25, 39,
    41, 45, 15, 21, 8,
    18, 2,  61, 56, 14,
};

inline uint64_t rotl64(uint64_t v, int c) {
  return c == 0 ? v : (v << c) | (v >> (64 - c));
}

void keccak_f1600(uint64_t a[25]) {
  for (int round = 0; round < 24; ++round) {
    // theta
    uint64_t c[5], d[5];
    for (int x = 0; x < 5; ++x)
      c[x] = a[x] ^ a[x + 5] ^ a[x + 10] ^ a[x + 15] ^ a[x + 20];
    for (int x = 0; x < 5; ++x)
      d[x] = c[(x + 4) % 5] ^ rotl64(c[(x + 1) % 5], 1);
    for (int i = 0; i < 25; ++i) a[i] ^= d[i % 5];
    // rho + pi
    uint64_t b[25];
    for (int x = 0; x < 5; ++x)
      for (int y = 0; y < 5; ++y) {
        int src = x + 5 * y;
        int dst = y + 5 * ((2 * x + 3 * y) % 5);
        b[dst] = rotl64(a[src], kRho[src]);
      }
    // chi
    for (int y = 0; y < 5; ++y)
      for (int x = 0; x < 5; ++x)
        a[x + 5 * y] = b[x + 5 * y] ^ (~b[(x + 1) % 5 + 5 * y] & b[(x + 2) % 5 + 5 * y]);
    // iota
    a[0] ^= kRoundConst[round];
  }
}

}  // namespace

extern "C" {

// SHA3-256: rate 136 bytes, domain padding 0x06...0x80.
void tc_sha3_256(const uint8_t* data, size_t len, uint8_t out[32]) {
  constexpr size_t kRate = 136;
  uint64_t state[25];
  std::memset(state, 0, sizeof(state));
  uint8_t* bytes = reinterpret_cast<uint8_t*>(state);  // little-endian lanes

  while (len >= kRate) {
    for (size_t i = 0; i < kRate; ++i) bytes[i] ^= data[i];
    keccak_f1600(state);
    data += kRate;
    len -= kRate;
  }
  for (size_t i = 0; i < len; ++i) bytes[i] ^= data[i];
  bytes[len] ^= 0x06;
  bytes[kRate - 1] ^= 0x80;
  keccak_f1600(state);
  std::memcpy(out, bytes, 32);
}

namespace {

inline uint32_t rotl32(uint32_t v, int c) { return (v << c) | (v >> (32 - c)); }

// One ChaCha20 block (20 rounds) with rand_chacha 0.2 framing: 64-bit block
// counter in words 12-13, 64-bit stream id (always 0 here) in words 14-15.
void chacha20_block(const uint32_t key[8], uint64_t counter, uint32_t out[16]) {
  const uint32_t init[16] = {
      0x61707865u, 0x3320646eu, 0x79622d32u, 0x6b206574u,
      key[0], key[1], key[2], key[3], key[4], key[5], key[6], key[7],
      static_cast<uint32_t>(counter), static_cast<uint32_t>(counter >> 32),
      0u, 0u,
  };
  uint32_t x[16];
  std::memcpy(x, init, sizeof(x));

#define TC_QR(a, b, c, d)                        \
  x[a] += x[b]; x[d] = rotl32(x[d] ^ x[a], 16);  \
  x[c] += x[d]; x[b] = rotl32(x[b] ^ x[c], 12);  \
  x[a] += x[b]; x[d] = rotl32(x[d] ^ x[a], 8);   \
  x[c] += x[d]; x[b] = rotl32(x[b] ^ x[c], 7)

  for (int i = 0; i < 10; ++i) {
    TC_QR(0, 4, 8, 12);
    TC_QR(1, 5, 9, 13);
    TC_QR(2, 6, 10, 14);
    TC_QR(3, 7, 11, 15);
    TC_QR(0, 5, 10, 15);
    TC_QR(1, 6, 11, 12);
    TC_QR(2, 7, 8, 13);
    TC_QR(3, 4, 9, 14);
  }
#undef TC_QR
  for (int i = 0; i < 16; ++i) out[i] = x[i] + init[i];
}

}  // namespace

// Raw word stream: words `word_off .. word_off+n_words` of the ChaCha20Rng
// output sequence (u32 words, little-endian in memory).
void tc_chacha20_words(const uint8_t key_bytes[32], uint64_t word_off,
                       uint32_t* out, size_t n_words) {
  uint32_t key[8];
  std::memcpy(key, key_bytes, 32);
  uint64_t block = word_off / 16;
  size_t pos = static_cast<size_t>(word_off % 16);
  uint32_t buf[16];
  while (n_words > 0) {
    chacha20_block(key, block++, buf);
    size_t take = 16 - pos;
    if (take > n_words) take = n_words;
    std::memcpy(out, buf + pos, take * 4);
    out += take;
    n_words -= take;
    pos = 0;
  }
}

// rand 0.7 `Standard` u8 stream: byte i = low byte of output word i
// (one full u32 consumed per byte) — the xor_with_hash keystream
// (/root/reference/src/lib.rs:710-715).
void tc_chacha20_low_bytes(const uint8_t key_bytes[32], uint64_t word_off,
                           uint8_t* out, size_t n) {
  uint32_t key[8];
  std::memcpy(key, key_bytes, 32);
  uint64_t block = word_off / 16;
  size_t pos = static_cast<size_t>(word_off % 16);
  uint32_t buf[16];
  while (n > 0) {
    chacha20_block(key, block++, buf);
    while (pos < 16 && n > 0) {
      *out++ = static_cast<uint8_t>(buf[pos++]);
      --n;
    }
    pos = 0;
  }
}

// Fused KDF: data XOR low-byte keystream keyed by sha3_256(key_material) —
// the whole xor_with_hash hot path in one native call.
void tc_xor_with_hash(const uint8_t* key_material, size_t key_len,
                      const uint8_t* data, size_t n, uint8_t* out) {
  uint8_t digest[32];
  tc_sha3_256(key_material, key_len, digest);
  uint32_t key[8];
  std::memcpy(key, digest, 32);
  uint64_t block = 0;
  size_t pos = 0, i = 0;
  uint32_t buf[16];
  while (i < n) {
    chacha20_block(key, block++, buf);
    for (pos = 0; pos < 16 && i < n; ++pos, ++i)
      out[i] = data[i] ^ static_cast<uint8_t>(buf[pos]);
  }
}

int tc_native_abi_version() { return 1; }

}  // extern "C"
