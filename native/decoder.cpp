// Native input-pipeline kernels: JPEG decode (libjpeg) + torch-parity
// antialiased bilinear resize + crop, with a std::thread worker pool.
//
// Replaces the reference's PIL + torchvision CPU worker path
// (bioscanclip/util/dataset.py:242-249, 169-223) — the per-image hot loop of
// the input pipeline (SURVEY.md hot loop (a)).  The resize uses the same
// separable triangle-filter algorithm as clibd_tpu/data/transforms.py
// (drop out-of-range taps, renormalize), so C++ and numpy paths agree to
// float rounding.
//
// C ABI (ctypes): see clibd_tpu/data/native.py.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// DCT-scaled decode: decode at scale m/8 (m<=8) when the full-size image is
// larger than needed — libjpeg folds the downscale into the IDCT, so an m/8
// decode costs ~(m/8)^2 of the full IDCT + scanline work.  Gated per call:
// the train path enables it (the filter difference vs a full decode +
// antialiased resize is far below augmentation noise), the eval path keeps
// full-resolution decode by default so extraction stays bit-identical for
// checkpoint-parity (min_edge_target <= 0 disables).
//
// Largest reduction m/8 whose output SHORTER edge still >= min_edge_target
// (never decode below the resize target — the antialiased resize afterwards
// still strictly downsamples, with the DCT scaling acting as a prefilter).
// libjpeg output dims are ceil(dim*m/8).
int pick_scale_num(int w, int h, int min_edge_target) {
  if (min_edge_target <= 0) return 8;
  int short_edge = std::min(w, h);
  for (int m = 1; m < 8; ++m) {
    long scaled = (static_cast<long>(short_edge) * m + 7) / 8;
    if (scaled >= min_edge_target) return m;
  }
  return 8;
}

// Decode JPEG bytes to RGB uint8 [h, w, 3]. Returns false on failure.
// min_edge_target > 0 enables DCT-scaled decode (output shorter edge stays
// >= the target); width/height return the DECODED (possibly scaled) dims.
bool decode_jpeg(const uint8_t* data, size_t len, std::vector<uint8_t>& out,
                 int& width, int& height, int min_edge_target = 0) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = pick_scale_num(cinfo.image_width, cinfo.image_height, min_edge_target);
  cinfo.scale_denom = 8;
  jpeg_start_decompress(&cinfo);
  width = cinfo.output_width;
  height = cinfo.output_height;
  out.resize(static_cast<size_t>(width) * height * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out.data() + static_cast<size_t>(cinfo.output_scanline) * width * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Eval fast path: when the (possibly DCT-scaled) decoded image needs no
// resize before the center crop — the production case: the BIOSCAN HDF5s
// ship 256px crops, eval = Resize(256) (identity) → CenterCrop(224) —
// decode scanlines only up to the crop window's bottom edge (the rest is
// jpeg_abort_decompress'd, skipping its IDCT + upsampling), and convert
// ONLY the crop window's pixels to [0,1] float.  Bit-exact vs the general
// decode→convert→identity-resize→crop path (identity resize weights are
// exactly {…,1,…}); skips the full-image float conversion and both
// identity-resize passes.  libjpeg-turbo's jpeg_crop_scanline /
// jpeg_skip_scanlines were measured NOT bit-exact here (they change the
// chroma-upsampling context on 4:2:0 sources), so rows above the window
// are decoded and discarded instead.
// Returns false if the JPEG is corrupt OR the geometry doesn't apply
// (caller falls back to the general path).
bool decode_center_crop_f32(const uint8_t* data, size_t len, float* out,
                            int out_size, int resize_to, bool dct_scale) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  cinfo.scale_num = pick_scale_num(cinfo.image_width, cinfo.image_height,
                                   dct_scale ? resize_to : 0);
  cinfo.scale_denom = 8;
  jpeg_calc_output_dimensions(&cinfo);
  int w = cinfo.output_width, h = cinfo.output_height;
  // applies only when the shorter-edge resize would be an exact identity
  // and the crop window fits (no zero-padding case)
  if (std::min(w, h) != resize_to || w < out_size || h < out_size) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  // center-crop origin, round-half-to-even (torchvision parity, see
  // process_one)
  int top = static_cast<int>(std::nearbyint((h - out_size) / 2.0));
  int left = static_cast<int>(std::nearbyint((w - out_size) / 2.0));
  jpeg_start_decompress(&cinfo);
  std::vector<uint8_t> row(static_cast<size_t>(cinfo.output_width) * 3);
  for (int y = 0; y < top + out_size; ++y) {
    uint8_t* rp = row.data();
    jpeg_read_scanlines(&cinfo, &rp, 1);
    if (y < top) continue;  // discarded context rows above the window
    const uint8_t* src = row.data() + static_cast<size_t>(left) * 3;
    float* dst = out + static_cast<size_t>(y - top) * out_size * 3;
    for (int x = 0; x < out_size * 3; ++x) dst[x] = src[x] * (1.0f / 255.0f);
  }
  jpeg_abort_decompress(&cinfo);  // bottom band: no IDCT/upsampling paid
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// 1D resize weights, torch F.interpolate(bilinear, antialias) parity:
// center-aligned mapping, triangle filter support max(1, scale),
// out-of-range taps dropped and weights renormalized.
struct ResizeWeights {
  std::vector<int> start;     // first input tap per output index
  std::vector<float> weights; // [out, width] flattened
  int width;
};

ResizeWeights make_weights(int in_size, int out_size, bool antialias) {
  double scale = static_cast<double>(in_size) / out_size;
  double support = (antialias && scale > 1.0) ? scale : 1.0;
  int width = static_cast<int>(std::ceil(2 * support)) + 2;
  ResizeWeights rw;
  rw.width = width;
  rw.start.resize(out_size);
  rw.weights.assign(static_cast<size_t>(out_size) * width, 0.f);
  for (int o = 0; o < out_size; ++o) {
    double center = (o + 0.5) * scale - 0.5;
    int lo = static_cast<int>(std::floor(center - support));
    rw.start[o] = lo;
    double total = 0.0;
    std::vector<double> w(width, 0.0);
    for (int t = 0; t < width; ++t) {
      int idx = lo + t;
      if (idx < 0 || idx >= in_size) continue;
      double dist = std::fabs((idx - center) / (support > 1.0 ? support : 1.0));
      double val = std::max(1.0 - dist, 0.0);
      w[t] = val;
      total += val;
    }
    for (int t = 0; t < width; ++t) {
      rw.weights[static_cast<size_t>(o) * width + t] =
          total > 0 ? static_cast<float>(w[t] / total) : 0.f;
    }
  }
  return rw;
}

// Separable resize: src [h, w, 3] float -> dst [out_h, out_w, 3] float.
void resize_bilinear(const float* src, int h, int w, float* dst, int out_h,
                     int out_w, bool antialias) {
  ResizeWeights wh = make_weights(h, out_h, antialias);
  ResizeWeights ww = make_weights(w, out_w, antialias);
  // vertical pass: [out_h, w, 3]
  std::vector<float> tmp(static_cast<size_t>(out_h) * w * 3, 0.f);
  for (int o = 0; o < out_h; ++o) {
    for (int t = 0; t < wh.width; ++t) {
      float wt = wh.weights[static_cast<size_t>(o) * wh.width + t];
      if (wt == 0.f) continue;
      int idx = std::clamp(wh.start[o] + t, 0, h - 1);
      const float* srow = src + static_cast<size_t>(idx) * w * 3;
      float* drow = tmp.data() + static_cast<size_t>(o) * w * 3;
      for (int x = 0; x < w * 3; ++x) drow[x] += wt * srow[x];
    }
  }
  // horizontal pass: [out_h, out_w, 3]
  std::memset(dst, 0, static_cast<size_t>(out_h) * out_w * 3 * sizeof(float));
  for (int o = 0; o < out_w; ++o) {
    for (int t = 0; t < ww.width; ++t) {
      float wt = ww.weights[static_cast<size_t>(o) * ww.width + t];
      if (wt == 0.f) continue;
      int idx = std::clamp(ww.start[o] + t, 0, w - 1);
      for (int y = 0; y < out_h; ++y) {
        const float* spix = tmp.data() + (static_cast<size_t>(y) * w + idx) * 3;
        float* dpix = dst + (static_cast<size_t>(y) * out_w + o) * 3;
        dpix[0] += wt * spix[0];
        dpix[1] += wt * spix[1];
        dpix[2] += wt * spix[2];
      }
    }
  }
}

// xorshift128+ PRNG for train-time crop sampling (self-deterministic per seed)
struct Rng {
  uint64_t s0, s1;
  explicit Rng(uint64_t seed) {
    s0 = seed ^ 0x9E3779B97F4A7C15ULL;
    s1 = (seed << 1) | 1;
    for (int i = 0; i < 8; ++i) next();
  }
  uint64_t next() {
    uint64_t x = s0, y = s1;
    s0 = y;
    x ^= x << 23;
    s1 = x ^ y ^ (x >> 17) ^ (y >> 26);
    return s1 + y;
  }
  double uniform() { return (next() >> 11) * (1.0 / 9007199254740992.0); }
  int randint(int lo, int hi) {  // inclusive lo, exclusive hi
    return lo + static_cast<int>(uniform() * (hi - lo));
  }
};

// torchvision RandomResizedCrop.get_params (scale 0.08-1, ratio 3/4-4/3)
void sample_rrc(Rng& rng, int h, int w, int& top, int& left, int& ch, int& cw) {
  double area = static_cast<double>(h) * w;
  double log_lo = std::log(3.0 / 4.0), log_hi = std::log(4.0 / 3.0);
  for (int attempt = 0; attempt < 10; ++attempt) {
    double ta = area * (0.08 + rng.uniform() * (1.0 - 0.08));
    double ar = std::exp(log_lo + rng.uniform() * (log_hi - log_lo));
    cw = static_cast<int>(std::lround(std::sqrt(ta * ar)));
    ch = static_cast<int>(std::lround(std::sqrt(ta / ar)));
    if (cw > 0 && cw <= w && ch > 0 && ch <= h) {
      top = rng.randint(0, h - ch + 1);
      left = rng.randint(0, w - cw + 1);
      return;
    }
  }
  double in_ratio = static_cast<double>(w) / h;
  if (in_ratio < 3.0 / 4.0) {
    cw = w;
    ch = static_cast<int>(std::lround(cw / (3.0 / 4.0)));
  } else if (in_ratio > 4.0 / 3.0) {
    ch = h;
    cw = static_cast<int>(std::lround(ch * (4.0 / 3.0)));
  } else {
    cw = w;
    ch = h;
  }
  top = (h - ch) / 2;
  left = (w - cw) / 2;
}

// Decode one JPEG -> [0,1] float -> resize shorter edge to resize_to.
// Returns false on decode failure; fills `resized` ([rh, rw, 3]).
bool decode_and_resize(const uint8_t* data, size_t len, int resize_to,
                       std::vector<float>& resized, int& rh, int& rw_,
                       bool dct_scale) {
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_jpeg(data, len, rgb, w, h, dct_scale ? resize_to : 0)) return false;

  std::vector<float> img(static_cast<size_t>(w) * h * 3);
  for (size_t i = 0; i < img.size(); ++i) img[i] = rgb[i] * (1.0f / 255.0f);

  if (h <= w) {
    rh = resize_to;
    // truncation, matching torchvision _compute_resized_output_size (and the
    // numpy path's resize_shorter_edge)
    rw_ = std::max(1, static_cast<int>(static_cast<double>(resize_to) * w / h));
  } else {
    rw_ = resize_to;
    rh = std::max(1, static_cast<int>(static_cast<double>(resize_to) * h / w));
  }
  if (rh == h && rw_ == w) {  // identity resize (256px-source production case)
    resized = std::move(img);
    return true;
  }
  resized.resize(static_cast<size_t>(rh) * rw_ * 3);
  resize_bilinear(img.data(), h, w, resized.data(), rh, rw_, true);
  return true;
}

// Random-resized crop of an already-resized image into out[out_size^2 * 3].
void rrc_into(const std::vector<float>& resized, int rh, int rw_, float* out,
              int out_size, uint64_t seed) {
  Rng rng(seed);
  int top, left, ch, cw;
  sample_rrc(rng, rh, rw_, top, left, ch, cw);
  std::vector<float> crop(static_cast<size_t>(ch) * cw * 3);
  for (int y = 0; y < ch; ++y) {
    std::memcpy(crop.data() + static_cast<size_t>(y) * cw * 3,
                resized.data() + ((static_cast<size_t>(y + top)) * rw_ + left) * 3,
                static_cast<size_t>(cw) * 3 * sizeof(float));
  }
  resize_bilinear(crop.data(), ch, cw, out, out_size, out_size, true);
}

// One image: decode -> [0,1] float -> resize shorter edge -> crop -> resize.
// mode 0 = eval (center crop), 1 = train (random resized crop via seed).
bool process_one(const uint8_t* data, size_t len, float* out, int out_size,
                 int resize_to, int mode, uint64_t seed, bool dct_scale) {
  // eval + identity-resize geometry: decode only the crop window (bit-exact
  // vs the general path — identity resize weights are exactly {…,1,…})
  if (mode == 0 && out_size <= resize_to &&
      decode_center_crop_f32(data, len, out, out_size, resize_to, dct_scale))
    return true;
  std::vector<float> resized;
  int rh, rw_;
  if (!decode_and_resize(data, len, resize_to, resized, rh, rw_, dct_scale))
    return false;

  if (mode == 0) {
    // center crop out_size with zero-padding when the resized image is
    // smaller (torchvision CenterCrop semantics, matching the numpy path
    // transforms.center_crop — copying out_size rows unconditionally would
    // read past the resized buffer whenever resize_to < out_size);
    // nearbyint = round-half-to-even, matching Python round() in torchvision
    int ph = std::max(out_size - rh, 0), pw = std::max(out_size - rw_, 0);
    int pad_top = ph / 2, pad_left = pw / 2;
    int H = rh + ph, W = rw_ + pw;  // virtual padded dims
    int top = static_cast<int>(std::nearbyint((H - out_size) / 2.0));
    int left = static_cast<int>(std::nearbyint((W - out_size) / 2.0));
    top = std::clamp(top, 0, std::max(H - out_size, 0));
    left = std::clamp(left, 0, std::max(W - out_size, 0));
    if (ph > 0 || pw > 0)
      std::memset(out, 0, static_cast<size_t>(out_size) * out_size * 3 * sizeof(float));
    int x0 = std::max(0, pad_left - left);
    int x1 = std::min(out_size, rw_ + pad_left - left);
    for (int y = 0; y < out_size; ++y) {
      int sy = y + top - pad_top;  // row in resized coords
      if (sy < 0 || sy >= rh || x1 <= x0) continue;
      std::memcpy(out + (static_cast<size_t>(y) * out_size + x0) * 3,
                  resized.data() + (static_cast<size_t>(sy) * rw_ + (x0 + left - pad_left)) * 3,
                  static_cast<size_t>(x1 - x0) * 3 * sizeof(float));
    }
  } else {
    rrc_into(resized, rh, rw_, out, out_size, seed);
  }
  return true;
}

// SimCLR two-view: decode + shorter-edge resize ONCE, two random-resized
// crops from independent seeds (halves decode+resize cost vs two passes).
bool process_two(const uint8_t* data, size_t len, float* out1, float* out2,
                 int out_size, int resize_to, uint64_t seed1, uint64_t seed2,
                 bool dct_scale) {
  std::vector<float> resized;
  int rh, rw_;
  if (!decode_and_resize(data, len, resize_to, resized, rh, rw_, dct_scale))
    return false;
  rrc_into(resized, rh, rw_, out1, out_size, seed1);
  rrc_into(resized, rh, rw_, out2, out_size, seed2);
  return true;
}

}  // namespace

extern "C" {

// Decode+transform a batch. jpegs: concatenated bytes; offsets[n+1].
// out: [n, out_size, out_size, 3] float32. ok: [n] int32 success flags.
// mode: 0 eval, 1 train; seeds: [n] uint64 (train only).
void clibd_decode_transform_batch(const uint8_t* jpegs, const int64_t* offsets,
                                  int n, float* out, int out_size,
                                  int resize_to, int mode, int dct_scale,
                                  const uint64_t* seeds, int32_t* ok,
                                  int num_threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      const uint8_t* data = jpegs + offsets[i];
      size_t len = static_cast<size_t>(offsets[i + 1] - offsets[i]);
      float* dst = out + static_cast<size_t>(i) * out_size * out_size * 3;
      uint64_t seed = seeds ? seeds[i] : 0;
      ok[i] = process_one(data, len, dst, out_size, resize_to, mode, seed,
                          dct_scale != 0) ? 1 : 0;
      if (!ok[i]) std::memset(dst, 0, static_cast<size_t>(out_size) * out_size * 3 * sizeof(float));
    }
  };
  int nt = std::max(1, num_threads);
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
}

// SimCLR two-view batch: decode+resize each JPEG once, emit two crops.
// out1/out2: [n, out_size, out_size, 3] f32; seeds1/seeds2: [n] uint64.
void clibd_decode_transform_batch_two_view(
    const uint8_t* jpegs, const int64_t* offsets, int n, float* out1,
    float* out2, int out_size, int resize_to, int dct_scale,
    const uint64_t* seeds1, const uint64_t* seeds2, int32_t* ok,
    int num_threads) {
  std::atomic<int> next(0);
  auto worker = [&]() {
    while (true) {
      int i = next.fetch_add(1);
      if (i >= n) break;
      const uint8_t* data = jpegs + offsets[i];
      size_t len = static_cast<size_t>(offsets[i + 1] - offsets[i]);
      size_t stride = static_cast<size_t>(out_size) * out_size * 3;
      float* d1 = out1 + static_cast<size_t>(i) * stride;
      float* d2 = out2 + static_cast<size_t>(i) * stride;
      ok[i] = process_two(data, len, d1, d2, out_size, resize_to,
                          seeds1[i], seeds2[i], dct_scale != 0) ? 1 : 0;
      if (!ok[i]) {
        std::memset(d1, 0, stride * sizeof(float));
        std::memset(d2, 0, stride * sizeof(float));
      }
    }
  };
  int nt = std::max(1, num_threads);
  if (nt == 1) {
    worker();
  } else {
    std::vector<std::thread> threads;
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
  }
}

// Standalone decode of one JPEG (for tests / single-image tools):
// returns 0 on failure; out must hold max_bytes; writes w/h.
int clibd_decode_jpeg(const uint8_t* data, int64_t len, uint8_t* out,
                      int64_t max_bytes, int* width, int* height) {
  std::vector<uint8_t> rgb;
  int w, h;
  if (!decode_jpeg(data, static_cast<size_t>(len), rgb, w, h)) return 0;
  if (static_cast<int64_t>(rgb.size()) > max_bytes) return 0;
  std::memcpy(out, rgb.data(), rgb.size());
  *width = w;
  *height = h;
  return 1;
}

int clibd_version() { return 3; }

}  // extern "C"
