/* gdt_native: host-side data-path kernels for gesturediffusion_tpu.
 *
 * The reference's data path is pure Python/numpy (SURVEY.md §2.9); its
 * per-item hotspot is window slicing + z-normalization + layout transpose
 * feeding the [B, D, 1, T] batch contract (reference:
 * data_loaders/gesture/data/dataset.py:75-79, data_loaders/tensors.py:56-66).
 * These C kernels fuse gather + z-norm/pad + layout transpose into one pass
 * per item; data/collate.py calls them via ctypes for every batch (pure C,
 * no Python API -> no GIL interaction).
 *
 * Build: `make -C native` -> libgdt_native.so
 */

#include <stddef.h>
#include <stdint.h>
#include <string.h>

/* Fused: out[d, t] = (src[(lo + t) * D + d] - mean[d]) * inv_std[d]
 * src:   [T_take, D] float32 take (row-major)
 * out:   [D, T] float32 window in channel-major layout
 * Pads out with zeros when lo + T exceeds t_take. */
void gdt_window_znorm_transpose(
    const float *src, int64_t t_take, int64_t d,
    int64_t lo, int64_t t,
    const float *mean, const float *inv_std,
    float *out)
{
    for (int64_t ti = 0; ti < t; ++ti) {
        int64_t row = lo + ti;
        if (row >= t_take) {
            for (int64_t di = 0; di < d; ++di)
                out[di * t + ti] = 0.0f;
            continue;
        }
        const float *in_row = src + row * d;
        for (int64_t di = 0; di < d; ++di)
            out[di * t + ti] = (in_row[di] - mean[di]) * inv_std[di];
    }
}

/* Batch variant over a stacked [B, T, D] buffer -> [B, D, T]. */
void gdt_batch_znorm_transpose(
    const float *src, int64_t b, int64_t t, int64_t d,
    const float *mean, const float *inv_std,
    float *out)
{
    for (int64_t bi = 0; bi < b; ++bi)
        gdt_window_znorm_transpose(
            src + bi * t * d, t, d, 0, t, mean, inv_std, out + bi * d * t);
}

/* Length mask: out[b, t] = t < lengths[b] (uint8). */
void gdt_lengths_to_mask(
    const int32_t *lengths, int64_t b, int64_t t, uint8_t *out)
{
    for (int64_t bi = 0; bi < b; ++bi) {
        int32_t len = lengths[bi];
        for (int64_t ti = 0; ti < t; ++ti)
            out[bi * t + ti] = ti < len;
    }
}

/* Pre-emphasis filter for audio feature prep:
 * out[0] = x[0]; out[i] = x[i] - coef * x[i-1]. */
void gdt_preemphasis(const float *x, int64_t n, float coef, float *out)
{
    if (n <= 0) return;
    out[0] = x[0];
    for (int64_t i = 1; i < n; ++i)
        out[i] = x[i] - coef * x[i - 1];
}
