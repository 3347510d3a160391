// Native MultiCUB canvas generator.
//
// C++ implementation of the host-side dataset synthesis that the reference
// does in Python (spair/data.py:39-174): background painting (solid / white /
// checkerboard / rotated checkerboard), <=15%-overlap rejection sampling of
// sprite placements, and alpha compositing. The Python generator costs
// minutes for the 100k-image training split; this path is ~2 orders of
// magnitude faster and is loaded via ctypes (split_vae_tpu/data/native.py)
// with a transparent numpy fallback.
//
// Build: g++ -O3 -march=native -shared -fPIC -o libmulticub.so multicub_gen.cpp

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <random>
#include <vector>

namespace {

constexpr int kSprite = 14;  // crop size (spair/data.py:35)

struct Box {
  int x, y;
};

inline float intersection(float a0, float a1, float b0, float b1) {
  if (a0 >= b0 && a1 <= b1) return a1 - a0;
  if (a0 < b0 && a1 > b1) return b1 - b0;
  if (a0 < b0 && a1 > b0) return a1 - b0;
  if (a1 > b1 && a0 < b1) return b1 - a0;
  return 0.0f;
}

inline bool overlaps(int rx, int ry, const std::vector<Box>& drawn) {
  for (const auto& b : drawn) {
    float inter = intersection(rx, rx + kSprite, b.x, b.x + kSprite) *
                  intersection(ry, ry + kSprite, b.y, b.y + kSprite);
    if (inter / (kSprite * kSprite) > 0.15f) return true;
  }
  return false;
}

// Paint an axis-aligned checkerboard into buf [h, w, 3].
void paint_ckb(float* buf, int h, int w, const float* c0, const float* c1,
               int cell_h, int cell_w) {
  for (int i = 0; i < h; ++i) {
    for (int j = 0; j < w; ++j) {
      const float* c = (((i / cell_h) + (j / cell_w)) % 2 == 0) ? c0 : c1;
      float* px = buf + (i * w + j) * 3;
      px[0] = c[0];
      px[1] = c[1];
      px[2] = c[2];
    }
  }
}

// Bilinear sample of src [h, w, 3] at (y, x); 0 outside (scipy 'constant').
inline void sample_bilinear(const float* src, int h, int w, float y, float x,
                            float* out) {
  int x0 = static_cast<int>(std::floor(x));
  int y0 = static_cast<int>(std::floor(y));
  for (int c = 0; c < 3; ++c) out[c] = 0.0f;
  for (int dy = 0; dy <= 1; ++dy) {
    for (int dx = 0; dx <= 1; ++dx) {
      int yi = y0 + dy, xi = x0 + dx;
      if (yi < 0 || yi >= h || xi < 0 || xi >= w) continue;
      float wy = (dy == 0) ? (y0 + 1 - y) : (y - y0);
      float wx = (dx == 0) ? (x0 + 1 - x) : (x - x0);
      const float* px = src + (yi * w + xi) * 3;
      float wgt = wy * wx;
      out[0] += wgt * px[0];
      out[1] += wgt * px[1];
      out[2] += wgt * px[2];
    }
  }
}

}  // namespace

extern "C" {

// bg_mode: 0=solid_fixed(palette) 1=solid_random 2=white 3=ckb 4=ckb_rot
//          5=texture (random pick from a host-supplied grayscale bank)
// palette: [n_colors, 3] in [0, 1]; cell: ckb cell count (mode 3) or cell px
// (mode 4). sprites: [n_sprites, 14, 14, 3] in [0, 255] (nonzero = fg).
// textures: [n_textures, size, size] grayscale in [0, 1] (mode 5 only; the
// host loads Kylberg files or synthesizes the offline procedural bank —
// spair/data.py:49,83-87). out_images: [n_samples, size, size, 3];
// out_counts: [n_samples].
void multicub_generate(const float* sprites, int n_sprites, float* out_images,
                       float* out_counts, int n_samples, int size,
                       int max_objects, int bg_mode, const float* palette,
                       int n_colors, int cell, uint64_t seed,
                       const float* textures, int n_textures) {
  std::mt19937_64 rng(seed);
  std::uniform_int_distribution<int> count_dist(0, max_objects);
  std::uniform_int_distribution<int> pos_dist(0, size - kSprite - 1);
  std::uniform_int_distribution<int> sprite_dist(0, n_sprites - 1);
  std::uniform_real_distribution<float> unit(0.0f, 1.0f);

  const int img_px = size * size * 3;
  std::vector<float> big;  // rotated-checkerboard scratch

  for (int s = 0; s < n_samples; ++s) {
    float* img = out_images + static_cast<int64_t>(s) * img_px;

    // --- background ---
    if (bg_mode == 0) {
      const float* c = palette + 3 * (rng() % n_colors);
      for (int p = 0; p < size * size; ++p) std::memcpy(img + p * 3, c, 12);
    } else if (bg_mode == 1) {
      int brightness = static_cast<int>(rng() % 256);
      float c[3];
      for (int k = 0; k < 3; ++k)
        c[k] = (brightness > 0 ? static_cast<int>(rng() % brightness) : 0) / 255.0f;
      for (int p = 0; p < size * size; ++p) std::memcpy(img + p * 3, c, 12);
    } else if (bg_mode == 2) {
      std::fill(img, img + img_px, 1.0f);
    } else if (bg_mode == 3) {
      int i0 = static_cast<int>(rng() % n_colors);
      int i1 = (i0 + 1 + static_cast<int>(rng() % (n_colors - 1))) % n_colors;
      paint_ckb(img, size, size, palette + 3 * i0, palette + 3 * i1,
                size / cell, size / cell);
    } else if (bg_mode == 4) {
      // 4x canvas, rotate by U(-90deg, 90deg), central-crop (spair/data.py:89-105)
      int big_hw = size * 4;
      big.assign(static_cast<size_t>(big_hw) * big_hw * 3, 0.0f);
      int i0 = static_cast<int>(rng() % n_colors);
      int i1 = (i0 + 1 + static_cast<int>(rng() % (n_colors - 1))) % n_colors;
      paint_ckb(big.data(), big_hw, big_hw, palette + 3 * i0, palette + 3 * i1,
                cell, cell);
      float angle = (unit(rng) * 2.0f - 1.0f) * static_cast<float>(M_PI) / 2.0f;
      float ca = std::cos(angle), sa = std::sin(angle);
      float cbig = (big_hw - 1) / 2.0f;
      int off = (big_hw - size) / 2;
      for (int i = 0; i < size; ++i) {
        for (int j = 0; j < size; ++j) {
          // rotate output coords back into the big canvas
          float yo = (i + off) - cbig, xo = (j + off) - cbig;
          float ys = ca * yo - sa * xo + cbig;
          float xs = sa * yo + ca * xo + cbig;
          sample_bilinear(big.data(), big_hw, big_hw, ys, xs, img + (i * size + j) * 3);
        }
      }
    } else if (bg_mode == 5 && textures != nullptr && n_textures > 0) {
      const float* tex =
          textures + static_cast<int64_t>(rng() % n_textures) * size * size;
      for (int p = 0; p < size * size; ++p) {
        img[p * 3] = img[p * 3 + 1] = img[p * 3 + 2] = tex[p];
      }
    }

    // --- sprites: rejection-sampled placement + alpha composite ---
    int n = count_dist(rng);
    out_counts[s] = static_cast<float>(n);
    std::vector<Box> drawn;
    for (int o = 0; o < n; ++o) {
      int rx = pos_dist(rng), ry = pos_dist(rng);
      int tries = 0;
      while (overlaps(rx, ry, drawn) && tries < 1000) {
        rx = pos_dist(rng);
        ry = pos_dist(rng);
        ++tries;
      }
      drawn.push_back({rx, ry});
      const float* spr =
          sprites + static_cast<int64_t>(sprite_dist(rng)) * kSprite * kSprite * 3;
      for (int i = 0; i < kSprite; ++i) {
        for (int j = 0; j < kSprite; ++j) {
          const float* sp = spr + (i * kSprite + j) * 3;
          float maxc = std::max(sp[0], std::max(sp[1], sp[2]));
          if (maxc > 0.0f) {  // alpha = 1 where any channel nonzero
            float* px = img + ((rx + i) * size + (ry + j)) * 3;
            px[0] = sp[0] / 255.0f;
            px[1] = sp[1] / 255.0f;
            px[2] = sp[2] / 255.0f;
          }
        }
      }
    }
  }
}

}  // extern "C"
