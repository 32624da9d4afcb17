/* libquantref — C++ oracle for the quant-tpu codec.
 *
 * This library is the FROZEN bit-exactness contract for the framework's
 * quantization codec (see SURVEY.md §7 "Hard parts": the upstream reference
 * mount /root/reference was empty at survey time, so this oracle plays the
 * role of the C++ reference the acceptance ladder tests against:
 * BASELINE.json:7 "codes bit-exact vs C++ reference, MSE within stated Δ").
 * If the real coodie/quant ever appears, reconcile THIS spec against it first.
 *
 * ── Codec spec (normative) ──────────────────────────────────────────────
 * Quantization (float32 → b-bit signed bin code, symmetric absmax):
 *   qmax  = 2^(b-1) - 1                     (e.g. 127 for b=8, 7 for b=4)
 *   scale = absmax(x) / qmax                (float32 division; scale=1 if absmax==0)
 *   code  = clip(nearbyint(x / scale), -qmax, qmax)
 *           - x/scale computed in float32
 *           - nearbyint under FE_TONEAREST = round-half-to-EVEN
 *             (matches numpy/jnp.round — this is what makes the Python/JAX
 *             implementation bit-exact against this oracle)
 * Dequantization: value = code * scale (float32 multiply).
 *
 * Grouped variant: x is rows×cols row-major; cols % group_size == 0; one
 * scale per (row, col-group), same formula per group.
 *
 * 4-bit packing (at-rest nibble order, little-endian nibbles):
 *   byte[j] = (u(code[2j+1]) << 4) | u(code[2j]),  u(c) = uint8(c + 8)
 *   odd n: the final high nibble is u(0) = 8.
 *
 * Codebook ("bin-lookup") variant — 4-bit non-uniform quantization
 * (BASELINE.json:5 "fused dequant(bin-lookup + scale)+matmul" /
 * "float→bin scalar quantization"; the linear codec above is the uniform
 * special case, this is the general non-uniform one):
 *   A codebook of 16 float32 entries lut[0..15], sorted strictly
 *   ascending, spanning [-1, 1] for absmax-normalized data.
 *   scale = absmax(x)                  (float32; 1.0 when absmax == 0)
 *   xn    = x / scale                  (float32 divide)
 *   bin   = #{ i in [0,14] : xn > t_i },  t_i = (lut[i] + lut[i+1]) / 2
 *           (midpoints in float32; a value exactly AT a midpoint takes
 *           the LOWER bin — deterministic nearest-entry assignment)
 *   code  = bin - 8                    (int8 in [-8, 7]: the same storage
 *           domain as linear int4, so nibble packing, entropy coding and
 *           checkpoint layout are shared verbatim)
 *   value = lut[code + 8] * scale      (float32 multiply)
 * The normative default codebook is QR_NF4_TABLE (NF4 constants — the
 * information-theoretically optimal bins for N(0,1) data, QLoRA §3).
 * Codebooks FIT from data (Lloyd-Max) use the same encode/decode with a
 * caller-supplied table; fitting itself is calibration, not codec.
 *
 * Entropy stage — canonical Huffman over bytes (deterministic):
 *   tree: repeatedly merge the two least nodes ordered by (count, order),
 *         leaf order = symbol value, internal order = 256 + creation_index;
 *   canonical codes assigned in (length, symbol) order, MSB-first bitstream.
 *   Container: "QREF" magic, u8 version=1, u8 flags, u64 n_bytes,
 *   256×u8 code lengths, payload. flags bit0: 1 = raw/stored (entropy
 *   disabled or incompressible), payload is the n_bytes verbatim.
 *   Single-distinct-symbol streams use code length 1 for that symbol.
 * ────────────────────────────────────────────────────────────────────────
 */
#ifndef QUANTREF_H_
#define QUANTREF_H_

#include <stddef.h>
#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* Per-tensor symmetric quantization. codes_out: n int8. Returns 0 on success. */
int qr_quantize(const float* x, int64_t n, int bits, float* scale_out,
                int8_t* codes_out);

/* Grouped quantization: x is rows*cols row-major, cols % group_size == 0.
 * scales_out: rows * (cols/group_size) float32. codes_out: rows*cols int8. */
int qr_quantize_grouped(const float* x, int64_t rows, int64_t cols, int bits,
                        int64_t group_size, float* scales_out,
                        int8_t* codes_out);

/* Dequantize per-tensor. */
void qr_dequantize(const int8_t* codes, int64_t n, float scale, float* out);

/* Dequantize grouped. */
void qr_dequantize_grouped(const int8_t* codes, int64_t rows, int64_t cols,
                           int64_t group_size, const float* scales, float* out);

/* The normative 16-entry NF4 codebook (sorted ascending, lut[0]=-1,
 * lut[7]=0, lut[15]=1). */
extern const float QR_NF4_TABLE[16];

/* Codebook quantization, per-tensor scale. lut: 16 ascending float32.
 * codes_out: n int8 in [-8, 7]. Returns 0 on success. */
int qr_quantize_lut(const float* x, int64_t n, const float* lut,
                    float* scale_out, int8_t* codes_out);

/* Grouped codebook quantization (one scale per (row, col-group)). */
int qr_quantize_lut_grouped(const float* x, int64_t rows, int64_t cols,
                            int64_t group_size, const float* lut,
                            float* scales_out, int8_t* codes_out);

/* Codebook dequantization: out[i] = lut[codes[i] + 8] * scale. */
void qr_dequantize_lut(const int8_t* codes, int64_t n, const float* lut,
                       float scale, float* out);

void qr_dequantize_lut_grouped(const int8_t* codes, int64_t rows,
                               int64_t cols, int64_t group_size,
                               const float* lut, const float* scales,
                               float* out);

/* Pack n 4-bit codes (int8 in [-8,7]) into ceil(n/2) bytes. Returns bytes written. */
int64_t qr_pack_int4(const int8_t* codes, int64_t n, uint8_t* out);

/* Unpack n 4-bit codes from packed bytes. Returns n. */
int64_t qr_unpack_int4(const uint8_t* packed, int64_t n, int8_t* codes_out);

/* Mean squared error between two float32 buffers (f64 accumulate). */
double qr_mse(const float* a, const float* b, int64_t n);

/* Upper bound on encoded size for n input bytes (container + worst case). */
int64_t qr_entropy_bound(int64_t n);

/* Canonical-Huffman encode. Returns encoded length, or -1 on error/overflow. */
int64_t qr_entropy_encode(const uint8_t* data, int64_t n, uint8_t* out,
                          int64_t out_cap);

/* Decode. Returns decoded length (n_bytes from header), or -1 on error. */
int64_t qr_entropy_decode(const uint8_t* comp, int64_t comp_len, uint8_t* out,
                          int64_t out_cap);

/* Decoded size from header without decoding; -1 if header invalid. */
int64_t qr_entropy_decoded_size(const uint8_t* comp, int64_t comp_len);

#ifdef __cplusplus
}
#endif

#endif /* QUANTREF_H_ */
