// SyncBN reference ops, CPU (C++).
//
// Behavioral parity target: the reference's CUDA SyncBN kernels
// (fbrs/model/syncbn/modules/functional/csrc/cuda/bn_cuda.cu:37-279):
//   sum_sqsum       per-channel sum and sum-of-squares over N*sp
//   forward         z = (x - mean) * rsqrt(var + eps) [* w + b]
//   backward_xhat   per-channel sum(dz) and sum(dz * xhat)
//   backward        dx = (dz - sum_dz_n - xhat * sum_dz_xhat_n) * w * invstd,
//                   dweight += sum(dz * xhat), dbias += sum(dz)
//                   (sum_dz_n / sum_dz_xhat_n pre-normalized by count, as the
//                   reference expects, bn_cuda.cu:216-222)
//
// On TPU the production SyncBN is one jax.lax.pmean of the statistics
// (xmem2_tpu/nn/functional.batch_norm_train); these ops exist as the
// CPU-native parity oracle for that layer, mirroring how the reference
// vendors its own CUDA implementation. Layout: NCHW flattened to
// [num, chn, sp], f32.

#include <cmath>
#include <cstdint>

extern "C" {

void syncbn_sum_sqsum(const float* x, float* sum, float* sqsum,
                      int64_t num, int64_t chn, int64_t sp) {
    for (int64_t c = 0; c < chn; ++c) {
        double s = 0.0, ss = 0.0;
        for (int64_t b = 0; b < num; ++b) {
            const float* row = x + (b * chn + c) * sp;
            for (int64_t i = 0; i < sp; ++i) {
                s += row[i];
                ss += double(row[i]) * row[i];
            }
        }
        sum[c] = float(s);
        sqsum[c] = float(ss);
    }
}

void syncbn_forward(float* z, const float* x, const float* weight,
                    const float* bias, const float* mean, const float* var,
                    int affine, float eps, int64_t num, int64_t chn,
                    int64_t sp) {
    for (int64_t c = 0; c < chn; ++c) {
        const float m = mean[c];
        float invstd = 0.f;
        if (var[c] != 0.f || eps != 0.f)
            invstd = 1.0f / std::sqrt(var[c] + eps);
        const float w = affine ? weight[c] : 1.f;
        const float bia = affine ? bias[c] : 0.f;
        for (int64_t b = 0; b < num; ++b) {
            const float* xr = x + (b * chn + c) * sp;
            float* zr = z + (b * chn + c) * sp;
            for (int64_t i = 0; i < sp; ++i)
                zr[i] = (xr[i] - m) * invstd * w + bia;
        }
    }
}

void syncbn_backward_xhat(const float* dz, const float* x, const float* mean,
                          const float* var, float* sum_dz,
                          float* sum_dz_xhat, float eps, int64_t num,
                          int64_t chn, int64_t sp) {
    for (int64_t c = 0; c < chn; ++c) {
        const float m = mean[c];
        float invstd = 0.f;
        if (var[c] != 0.f || eps != 0.f)
            invstd = 1.0f / std::sqrt(var[c] + eps);
        double s = 0.0, sx = 0.0;
        for (int64_t b = 0; b < num; ++b) {
            const float* dzr = dz + (b * chn + c) * sp;
            const float* xr = x + (b * chn + c) * sp;
            for (int64_t i = 0; i < sp; ++i) {
                s += dzr[i];
                sx += double(dzr[i]) * (xr[i] - m) * invstd;
            }
        }
        sum_dz[c] = float(s);
        sum_dz_xhat[c] = float(sx);
    }
}

void syncbn_backward(const float* dz, const float* x, const float* weight,
                     const float* mean, const float* var,
                     const float* sum_dz_n, const float* sum_dz_xhat_n,
                     float* dx, float* dweight, float* dbias, int affine,
                     float eps, int64_t num, int64_t chn, int64_t sp) {
    const double count = double(num) * double(sp);
    for (int64_t c = 0; c < chn; ++c) {
        const float m = mean[c];
        float invstd = 0.f;
        if (var[c] != 0.f || eps != 0.f)
            invstd = 1.0f / std::sqrt(var[c] + eps);
        const float w = affine ? weight[c] : 1.f;
        const float mul = w * invstd;
        for (int64_t b = 0; b < num; ++b) {
            const float* dzr = dz + (b * chn + c) * sp;
            const float* xr = x + (b * chn + c) * sp;
            float* dxr = dx + (b * chn + c) * sp;
            for (int64_t i = 0; i < sp; ++i) {
                const float xhat = (xr[i] - m) * invstd;
                dxr[i] = (dzr[i] - sum_dz_n[c] - xhat * sum_dz_xhat_n[c])
                         * mul;
            }
        }
        if (affine) {
            dweight[c] += float(sum_dz_xhat_n[c] * count);
            dbias[c] += float(sum_dz_n[c] * count);
        }
    }
}

}  // extern "C"
