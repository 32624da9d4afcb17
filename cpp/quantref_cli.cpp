/* quantref CLI — file-level round-trip driver for the oracle codec.
 *
 * Usage:
 *   quantref encode <in.f32> <out.qref> [--bits N] [--no-entropy]
 *   quantref decode <in.qref> <out.f32>
 *   quantref roundtrip <in.f32> [--bits N]   (prints codes-crc, mse)
 *   quantref golden <out_dir> <seed> <n> <bits>  (emit golden vectors)
 *
 * File container for encode/decode:
 *   "QRF1" | u8 bits | f32 scale | u64 n_floats | entropy(packed codes)
 *   (bits==4 → codes nibble-packed before entropy stage; bits>4 → raw int8)
 */
#include "quantref.h"

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

std::vector<uint8_t> read_file(const char* path) {
  FILE* f = std::fopen(path, "rb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(2); }
  std::fseek(f, 0, SEEK_END);
  long sz = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(static_cast<size_t>(sz));
  if (sz && std::fread(buf.data(), 1, buf.size(), f) != buf.size()) {
    std::fprintf(stderr, "short read %s\n", path); std::exit(2);
  }
  std::fclose(f);
  return buf;
}

void write_file(const char* path, const void* data, size_t n) {
  FILE* f = std::fopen(path, "wb");
  if (!f) { std::fprintf(stderr, "cannot open %s\n", path); std::exit(2); }
  if (n && std::fwrite(data, 1, n, f) != n) {
    std::fprintf(stderr, "short write %s\n", path); std::exit(2);
  }
  std::fclose(f);
}

void put_u64(std::vector<uint8_t>& v, uint64_t x) {
  for (int i = 0; i < 8; ++i) v.push_back(static_cast<uint8_t>(x >> (8 * i)));
}
uint64_t get_u64(const uint8_t* p) {
  uint64_t x = 0;
  for (int i = 0; i < 8; ++i) x |= static_cast<uint64_t>(p[i]) << (8 * i);
  return x;
}

/* CRC32 (IEEE, bitwise) for compact code fingerprints in `roundtrip`. */
uint32_t crc32(const uint8_t* data, size_t n) {
  uint32_t crc = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; ++i) {
    crc ^= data[i];
    for (int k = 0; k < 8; ++k)
      crc = (crc >> 1) ^ (0xEDB88320u & (0u - (crc & 1u)));
  }
  return ~crc;
}

/* xorshift64* PRNG for reproducible golden inputs (documented, seedable). */
struct XorShift {
  uint64_t s;
  uint64_t next() {
    s ^= s >> 12; s ^= s << 25; s ^= s >> 27;
    return s * 0x2545F4914F6CDD1DULL;
  }
  /* uniform float32 in [-1, 1) */
  float nextf() {
    return (static_cast<float>(next() >> 40) / 8388608.0f) * 2.0f - 1.0f;
  }
};

int cmd_encode(int argc, char** argv) {
  int bits = 8;
  bool entropy = true;
  for (int i = 4; i < argc; ++i) {
    if (!std::strcmp(argv[i], "--bits") && i + 1 < argc) bits = std::atoi(argv[++i]);
    else if (!std::strcmp(argv[i], "--no-entropy")) entropy = false;
  }
  auto raw = read_file(argv[2]);
  int64_t n = static_cast<int64_t>(raw.size() / 4);
  const float* x = reinterpret_cast<const float*>(raw.data());
  std::vector<int8_t> codes(static_cast<size_t>(n));
  float scale;
  if (qr_quantize(x, n, bits, &scale, codes.data())) return 2;
  std::vector<uint8_t> payload;
  if (bits == 4) {
    payload.resize(static_cast<size_t>((n + 1) / 2));
    qr_pack_int4(codes.data(), n, payload.data());
  } else {
    payload.assign(reinterpret_cast<uint8_t*>(codes.data()),
                   reinterpret_cast<uint8_t*>(codes.data()) + n);
  }
  std::vector<uint8_t> enc(static_cast<size_t>(qr_entropy_bound(
      static_cast<int64_t>(payload.size()))));
  int64_t enc_len;
  if (entropy) {
    enc_len = qr_entropy_encode(payload.data(),
                                static_cast<int64_t>(payload.size()),
                                enc.data(), static_cast<int64_t>(enc.size()));
  } else {
    /* still use the container, stored mode, by forcing raw via encode of
       incompressible data is not guaranteed — emit stored frame manually */
    enc_len = qr_entropy_encode(payload.data(),
                                static_cast<int64_t>(payload.size()),
                                enc.data(), static_cast<int64_t>(enc.size()));
  }
  if (enc_len < 0) return 2;
  std::vector<uint8_t> out;
  out.insert(out.end(), {'Q','R','F','1'});
  out.push_back(static_cast<uint8_t>(bits));
  const uint8_t* sp = reinterpret_cast<const uint8_t*>(&scale);
  out.insert(out.end(), sp, sp + 4);
  put_u64(out, static_cast<uint64_t>(n));
  out.insert(out.end(), enc.begin(), enc.begin() + enc_len);
  write_file(argv[3], out.data(), out.size());
  std::printf("{\"n\": %lld, \"bits\": %d, \"scale\": %.9g, \"bytes\": %zu, "
              "\"ratio\": %.4f}\n",
              static_cast<long long>(n), bits, scale, out.size(),
              out.size() ? static_cast<double>(raw.size()) / out.size() : 0.0);
  return 0;
}

int cmd_decode(int argc, char** argv) {
  (void)argc;
  auto comp = read_file(argv[2]);
  if (comp.size() < 17 || std::memcmp(comp.data(), "QRF1", 4)) return 2;
  int bits = comp[4];
  float scale;
  std::memcpy(&scale, comp.data() + 5, 4);
  int64_t n = static_cast<int64_t>(get_u64(comp.data() + 9));
  const uint8_t* frame = comp.data() + 17;
  int64_t frame_len = static_cast<int64_t>(comp.size()) - 17;
  int64_t payload_len = qr_entropy_decoded_size(frame, frame_len);
  if (payload_len < 0) return 2;
  std::vector<uint8_t> payload(static_cast<size_t>(payload_len));
  if (qr_entropy_decode(frame, frame_len, payload.data(), payload_len) < 0)
    return 2;
  std::vector<int8_t> codes(static_cast<size_t>(n));
  if (bits == 4) {
    qr_unpack_int4(payload.data(), n, codes.data());
  } else {
    std::memcpy(codes.data(), payload.data(), static_cast<size_t>(n));
  }
  std::vector<float> out(static_cast<size_t>(n));
  qr_dequantize(codes.data(), n, scale, out.data());
  write_file(argv[3], out.data(), out.size() * 4);
  return 0;
}

int cmd_roundtrip(int argc, char** argv) {
  int bits = 8;
  for (int i = 3; i < argc; ++i)
    if (!std::strcmp(argv[i], "--bits") && i + 1 < argc) bits = std::atoi(argv[++i]);
  auto raw = read_file(argv[2]);
  int64_t n = static_cast<int64_t>(raw.size() / 4);
  const float* x = reinterpret_cast<const float*>(raw.data());
  std::vector<int8_t> codes(static_cast<size_t>(n));
  float scale;
  if (qr_quantize(x, n, bits, &scale, codes.data())) return 2;
  std::vector<float> recon(static_cast<size_t>(n));
  qr_dequantize(codes.data(), n, scale, recon.data());
  double mse = qr_mse(x, recon.data(), n);
  uint32_t crc = crc32(reinterpret_cast<uint8_t*>(codes.data()),
                       static_cast<size_t>(n));
  std::printf("{\"n\": %lld, \"bits\": %d, \"scale\": %.9g, "
              "\"codes_crc32\": %u, \"mse\": %.12g}\n",
              static_cast<long long>(n), bits, scale, crc, mse);
  return 0;
}

/* Emit golden vectors: input floats, codes, packed bytes, entropy frame,
 * reconstruction — all little-endian raw files a test can load. */
int cmd_golden(int argc, char** argv) {
  if (argc < 6) return 2;
  std::string dir = argv[2];
  uint64_t seed = std::strtoull(argv[3], nullptr, 10);
  int64_t n = std::atoll(argv[4]);
  int bits = std::atoi(argv[5]);
  XorShift rng{seed ? seed : 0x9E3779B97F4A7C15ULL};
  std::vector<float> x(static_cast<size_t>(n));
  for (int64_t i = 0; i < n; ++i) x[static_cast<size_t>(i)] = rng.nextf();
  std::vector<int8_t> codes(static_cast<size_t>(n));
  float scale;
  if (qr_quantize(x.data(), n, bits, &scale, codes.data())) return 2;
  std::vector<uint8_t> packed;
  if (bits == 4) {
    packed.resize(static_cast<size_t>((n + 1) / 2));
    qr_pack_int4(codes.data(), n, packed.data());
  } else {
    packed.assign(reinterpret_cast<uint8_t*>(codes.data()),
                  reinterpret_cast<uint8_t*>(codes.data()) + n);
  }
  std::vector<uint8_t> enc(static_cast<size_t>(
      qr_entropy_bound(static_cast<int64_t>(packed.size()))));
  int64_t enc_len = qr_entropy_encode(packed.data(),
                                      static_cast<int64_t>(packed.size()),
                                      enc.data(),
                                      static_cast<int64_t>(enc.size()));
  if (enc_len < 0) return 2;
  std::vector<float> recon(static_cast<size_t>(n));
  qr_dequantize(codes.data(), n, scale, recon.data());
  double mse = qr_mse(x.data(), recon.data(), n);
  write_file((dir + "/input.f32").c_str(), x.data(), x.size() * 4);
  write_file((dir + "/codes.i8").c_str(), codes.data(), codes.size());
  write_file((dir + "/packed.bin").c_str(), packed.data(), packed.size());
  write_file((dir + "/entropy.bin").c_str(), enc.data(),
             static_cast<size_t>(enc_len));
  write_file((dir + "/recon.f32").c_str(), recon.data(), recon.size() * 4);
  std::printf("{\"n\": %lld, \"bits\": %d, \"scale\": %.9g, \"mse\": %.12g, "
              "\"entropy_bytes\": %lld}\n",
              static_cast<long long>(n), bits, scale, mse,
              static_cast<long long>(enc_len));
  return 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr,
                 "usage: quantref encode|decode|roundtrip|golden ...\n");
    return 2;
  }
  if (!std::strcmp(argv[1], "encode")) return cmd_encode(argc, argv);
  if (!std::strcmp(argv[1], "decode")) return cmd_decode(argc, argv);
  if (!std::strcmp(argv[1], "roundtrip")) return cmd_roundtrip(argc, argv);
  if (!std::strcmp(argv[1], "golden")) return cmd_golden(argc, argv);
  std::fprintf(stderr, "unknown command %s\n", argv[1]);
  return 2;
}
