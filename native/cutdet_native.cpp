// cutdet_native: native host-side runtime for cut_detection_tpu.
//
// The reference leans on OpenCV's C++ for its host hot loops (decode +
// resize, frameID/data.py:213-222) and on torch CPU ops for the
// segmentation table (frameID/segmentation.py).  This library supplies
// first-party native equivalents:
//
//   - resize_bilinear_u8: bit-exact reimplementation of OpenCV's uint8
//     INTER_LINEAR (fixed-point coefficients at 2^11, SIMD vertical-pass
//     rounding semantics: >>4, mulhi16, +2, >>2) — the same recipe as
//     cut_detection_tpu/ops/resize.py, for hosts without cv2 and for the
//     decode pipeline's preprocessing stage.
//   - bgr_to_rgb_norm_f32: fused channel-flip + /255 normalize
//     (frameID/data.py:224-228 semantics) for host-side preprocessing.
//   - rle_encode / glue_orphans / combine_adjacent: the segmentation
//     table build and data-dependent merge loops
//     (frameID/segmentation.py:26-183 semantics, including the
//     mis-parenthesized mean update behind bug_compat).
//
// Pure C ABI for ctypes binding (cut_detection_tpu/native.py).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

constexpr int kCoefBits = 11;
constexpr int kCoefScale = 1 << kCoefBits;  // 2048

// Round half to even, like cvRound / np.rint.
inline int round_half_even(float v) {
    return static_cast<int>(std::nearbyintf(v));
}

struct Taps {
    std::vector<int> lo, hi;
    std::vector<int> c_lo, c_hi;
};

// Horizontal taps: borders pinned (coef collapses onto the clamped tap).
Taps taps_horizontal(int in_size, int out_size) {
    Taps t;
    t.lo.resize(out_size);
    t.hi.resize(out_size);
    t.c_lo.resize(out_size);
    t.c_hi.resize(out_size);
    const double scale = static_cast<double>(in_size) / out_size;
    for (int d = 0; d < out_size; ++d) {
        float src = static_cast<float>((d + 0.5) * scale - 0.5);
        int lo = static_cast<int>(std::floor(src));
        float frac = src - lo;
        if (lo < 0) { lo = 0; frac = 0.f; }
        if (lo >= in_size - 1) { lo = std::max(in_size - 2, 0); frac = 1.f; }
        int hi = std::min(lo + 1, in_size - 1);
        t.lo[d] = lo;
        t.hi[d] = hi;
        t.c_lo[d] = round_half_even((1.f - frac) * kCoefScale);
        t.c_hi[d] = round_half_even(frac * kCoefScale);
    }
    return t;
}

// Vertical taps: indices clamped, fractional coefficients kept.
Taps taps_vertical(int in_size, int out_size) {
    Taps t;
    t.lo.resize(out_size);
    t.hi.resize(out_size);
    t.c_lo.resize(out_size);
    t.c_hi.resize(out_size);
    const double scale = static_cast<double>(in_size) / out_size;
    for (int d = 0; d < out_size; ++d) {
        float src = static_cast<float>((d + 0.5) * scale - 0.5);
        int sy = static_cast<int>(std::floor(src));
        float frac = src - sy;
        t.lo[d] = std::min(std::max(sy, 0), in_size - 1);
        t.hi[d] = std::min(std::max(sy + 1, 0), in_size - 1);
        t.c_lo[d] = round_half_even((1.f - frac) * kCoefScale);
        t.c_hi[d] = round_half_even(frac * kCoefScale);
    }
    return t;
}

}  // namespace

extern "C" {

// src: [sh, sw, ch] uint8 HWC -> dst: [dh, dw, ch].
void resize_bilinear_u8(const uint8_t* src, int sh, int sw, int ch,
                        uint8_t* dst, int dh, int dw) {
    Taps tx = taps_horizontal(sw, dw);
    Taps ty = taps_vertical(sh, dh);
    const int row_elems = dw * ch;
    // Horizontal pass for all source rows used (all rows, simple).
    std::vector<int32_t> hbuf(static_cast<size_t>(sh) * row_elems);
    for (int y = 0; y < sh; ++y) {
        const uint8_t* srow = src + static_cast<size_t>(y) * sw * ch;
        int32_t* hrow = hbuf.data() + static_cast<size_t>(y) * row_elems;
        for (int x = 0; x < dw; ++x) {
            const uint8_t* p0 = srow + tx.lo[x] * ch;
            const uint8_t* p1 = srow + tx.hi[x] * ch;
            const int c0 = tx.c_lo[x], c1 = tx.c_hi[x];
            for (int c = 0; c < ch; ++c) {
                hrow[x * ch + c] = p0[c] * c0 + p1[c] * c1;
            }
        }
    }
    // Vertical pass with OpenCV's SIMD rounding semantics.
    for (int y = 0; y < dh; ++y) {
        const int32_t* r0 = hbuf.data() + static_cast<size_t>(ty.lo[y]) * row_elems;
        const int32_t* r1 = hbuf.data() + static_cast<size_t>(ty.hi[y]) * row_elems;
        const int32_t b0 = ty.c_lo[y], b1 = ty.c_hi[y];
        uint8_t* drow = dst + static_cast<size_t>(y) * row_elems;
        for (int i = 0; i < row_elems; ++i) {
            int32_t s0 = r0[i] >> 4;  // into int16 range
            int32_t s1 = r1[i] >> 4;
            int32_t acc = ((s0 * b0) >> 16) + ((s1 * b1) >> 16);
            int32_t v = (acc + 2) >> 2;
            drow[i] = static_cast<uint8_t>(std::min(std::max(v, 0), 255));
        }
    }
}

// BGR uint8 HWC -> RGB float32 HWC in [0,1] (frameID/data.py:224-228).
void bgr_to_rgb_norm_f32(const uint8_t* src, int n_pixels, float* dst) {
    constexpr float kInv = 1.0f / 255.0f;
    for (int i = 0; i < n_pixels; ++i) {
        const uint8_t* p = src + 3 * i;
        float* q = dst + 3 * i;
        q[0] = p[2] * kInv;
        q[1] = p[1] * kInv;
        q[2] = p[0] * kInv;
    }
}

// Build the segment table from per-frame (conf, pred).
// Outputs are caller-allocated with capacity n.  Returns segment count.
int64_t rle_encode(const float* conf, const int32_t* pred, int64_t n,
                   int64_t* start, int64_t* end, int64_t* type,
                   int64_t* runlen, float* mean) {
    if (n <= 0) return 0;
    int64_t s = 0;
    int64_t seg_start = 0;
    float seg_sum = conf[0];
    for (int64_t i = 1; i <= n; ++i) {
        if (i == n || pred[i] != pred[i - 1]) {
            start[s] = seg_start;
            end[s] = i - 1;
            type[s] = pred[i - 1];
            runlen[s] = i - seg_start;
            // float32 sequential accumulation, matching numpy reduceat.
            mean[s] = seg_sum / static_cast<float>(i - seg_start);
            ++s;
            if (i < n) {
                seg_start = i;
                seg_sum = conf[i];
            }
        } else {
            seg_sum += conf[i];
        }
    }
    return s;
}

namespace {

// Merge row `o` into row `nb` (frameID/segmentation.py:69-89 semantics).
inline void update_neighbor(int64_t* start, int64_t* end, int64_t* /*type*/,
                            int64_t* runlen, float* mean, int64_t o,
                            int64_t nb, bool bug_compat) {
    if (o < nb) {
        start[nb] = start[o];
    } else {
        end[nb] = end[o];
    }
    const float m_n = mean[nb], m_o = mean[o];
    const float l_n = static_cast<float>(runlen[nb]);
    const float l_o = static_cast<float>(runlen[o]);
    mean[nb] = bug_compat ? (m_n * l_n + m_o * l_o) / l_n + l_o
                          : (m_n * l_n + m_o * l_o) / (l_n + l_o);
    runlen[nb] = end[nb] - start[nb] + 1;
}

inline void delete_row(int64_t* start, int64_t* end, int64_t* type,
                       int64_t* runlen, float* mean, int64_t idx,
                       int64_t count) {
    const int64_t tail = count - idx - 1;
    if (tail > 0) {
        std::memmove(start + idx, start + idx + 1, tail * sizeof(int64_t));
        std::memmove(end + idx, end + idx + 1, tail * sizeof(int64_t));
        std::memmove(type + idx, type + idx + 1, tail * sizeof(int64_t));
        std::memmove(runlen + idx, runlen + idx + 1, tail * sizeof(int64_t));
        std::memmove(mean + idx, mean + idx + 1, tail * sizeof(float));
    }
}

inline bool is_orphan(int64_t type, int64_t len, int64_t k1, int64_t kb) {
    // frameID/segmentation.py:12-17: non-blank shorter than k1, or blank
    // (type 2) shorter than kb.
    return (type != 2 && len < k1) || (type == 2 && len < kb);
}

}  // namespace

// In-place orphan gluing (frameID/segmentation.py:91-166 semantics).
// Returns the new segment count.
int64_t glue_orphans(int64_t* start, int64_t* end, int64_t* type,
                     int64_t* runlen, float* mean, int64_t count,
                     int64_t real_threshold, int64_t blank_threshold,
                     int bug_compat) {
    while (count > 1) {
        // Find the least-confident orphan (first minimum on ties, matching
        // argsort-then-first).
        int64_t target = -1;
        float best = 0.f;
        for (int64_t i = 0; i < count; ++i) {
            if (is_orphan(type[i], runlen[i], real_threshold,
                          blank_threshold)) {
                if (target < 0 || mean[i] < best) {
                    target = i;
                    best = mean[i];
                }
            }
        }
        if (target < 0) break;
        int64_t nb;
        if (target == 0) {
            nb = 1;
        } else if (target == count - 1) {
            nb = target - 1;
        } else {
            // Strictly-longer previous wins; ties go next
            // (segmentation.py:147-156).
            nb = (runlen[target - 1] > runlen[target + 1]) ? target - 1
                                                          : target + 1;
        }
        update_neighbor(start, end, type, runlen, mean, target, nb,
                        bug_compat != 0);
        delete_row(start, end, type, runlen, mean, target, count);
        --count;
    }
    return count;
}

// In-place adjacent merge (frameID/segmentation.py:168-183): repeatedly
// merge the FIRST equal-type adjacent pair, left row into right.
int64_t combine_adjacent(int64_t* start, int64_t* end, int64_t* type,
                         int64_t* runlen, float* mean, int64_t count,
                         int bug_compat) {
    int64_t i = 0;
    while (i + 1 < count) {
        if (type[i] == type[i + 1]) {
            update_neighbor(start, end, type, runlen, mean, i, i + 1,
                            bug_compat != 0);
            delete_row(start, end, type, runlen, mean, i, count);
            --count;
            // The reference rescans from the front; after merging at i the
            // earliest possible new match is at i-1.
            i = (i > 0) ? i - 1 : 0;
        } else {
            ++i;
        }
    }
    return count;
}

}  // extern "C"
