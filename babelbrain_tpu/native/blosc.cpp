// LZ4 block decoder for BLOSC1-compressed HDF5 chunks.
//
// The reference persists every HDF5 payload through H5pySimple with the
// BLOSC filter (SURVEY.md section 2.9; `InformationForDrivingSystems.md:12-16`),
// so files produced by the reference (DataForSim.h5, MapPichardo.h5,
// thermal outputs) carry filter id 32001. This image has no blosc/lz4
// codec, so we decode natively: the Python side (native/__init__.py
// blosc_decompress) parses the 16-byte BLOSC1 chunk header + block starts
// and calls this safe LZ4 block decompressor per stream.
//
// LZ4 block format: sequences of
//   [token][literal-length ext*][literals][2-byte LE offset][match-length ext*]
// where token = (litlen<<4)|matchlen, 15 escapes to 255-run extension bytes,
// and match length is stored minus the 4-byte minimum.

#include <cstdint>
#include <cstring>

extern "C" {

// Returns number of bytes written to dst, or -1 on malformed input.
int64_t lz4_decompress_block(const uint8_t *src, int64_t src_len,
                             uint8_t *dst, int64_t dst_cap) {
  const uint8_t *ip = src;
  const uint8_t *iend = src + src_len;
  uint8_t *op = dst;
  uint8_t *oend = dst + dst_cap;

  while (ip < iend) {
    unsigned token = *ip++;
    // literals
    int64_t lit = token >> 4;
    if (lit == 15) {
      unsigned b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        lit += b;
      } while (b == 255);
    }
    if (ip + lit > iend || op + lit > oend) return -1;
    std::memcpy(op, ip, (size_t)lit);
    ip += lit;
    op += lit;
    if (ip >= iend) break;  // last sequence carries no match

    // match
    if (ip + 2 > iend) return -1;
    int64_t offset = (int64_t)ip[0] | ((int64_t)ip[1] << 8);
    ip += 2;
    if (offset == 0 || op - dst < offset) return -1;
    int64_t mlen = token & 0xF;
    if (mlen == 15) {
      unsigned b;
      do {
        if (ip >= iend) return -1;
        b = *ip++;
        mlen += b;
      } while (b == 255);
    }
    mlen += 4;
    if (op + mlen > oend) return -1;
    const uint8_t *mp = op - offset;
    // byte-wise copy: overlapping matches are the RLE case and must
    // propagate bytes written earlier in this same copy
    for (int64_t i = 0; i < mlen; i++) op[i] = mp[i];
    op += mlen;
  }
  return op - dst;
}

// Byte-unshuffle: src holds `typesize` planes of n/typesize bytes each;
// dst gets the interleaved original. (BLOSC applies shuffle per block.)
void blosc_unshuffle(const uint8_t *src, uint8_t *dst, int64_t n,
                     int64_t typesize) {
  int64_t per = n / typesize;
  for (int64_t t = 0; t < typesize; t++) {
    const uint8_t *s = src + t * per;
    uint8_t *d = dst + t;
    for (int64_t i = 0; i < per; i++) d[i * typesize] = s[i];
  }
}

}  // extern "C"
