// ttdata: native ImageNet eval-path image loader.
//
// The reference's intended fast input path is the commented-out NVIDIA
// DALI pipeline (utils/preprocess.py:129-219); its live path is
// torchvision/PIL in 6 worker processes.  This is the TPU-framework
// equivalent: libjpeg decode -> antialiased bilinear resize (shorter
// side) -> center crop -> normalize, in one C pass per image, emitting
// NHWC float32 ready for device upload.
//
// The resize replicates PIL's resampler exactly (triangle filter with
// support scaled by the downsampling ratio, fixed-point 8bpc arithmetic
// with PRECISION_BITS = 22, horizontal-then-vertical passes with uint8
// clipping between them), so the native path is pixel-identical to the
// data/transforms.py parity path rather than "a different filter".
// Only the rows/columns the final crop needs are ever resampled.
//
// C ABI only (ctypes).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <csetjmp>

namespace {

struct JpegErr {
    jpeg_error_mgr mgr;
    jmp_buf jump;
};

void jpeg_err_exit(j_common_ptr cinfo) {
    JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
    longjmp(err->jump, 1);
}

// Decode a JPEG file into an RGB byte buffer.  Returns true on success.
bool decode_rgb(const char* path, std::vector<uint8_t>& rgb,
                int& w, int& h) {
    FILE* f = fopen(path, "rb");
    if (!f) return false;

    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jump)) {
        jpeg_destroy_decompress(&cinfo);
        fclose(f);
        return false;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, f);
    jpeg_read_header(&cinfo, TRUE);
    cinfo.out_color_space = JCS_RGB;
    jpeg_start_decompress(&cinfo);
    w = cinfo.output_width;
    h = cinfo.output_height;
    rgb.resize((size_t)w * h * 3);
    while (cinfo.output_scanline < cinfo.output_height) {
        uint8_t* row = rgb.data() + (size_t)cinfo.output_scanline * w * 3;
        jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return true;
}

// ---- PIL-exact antialiased bilinear resampling (Pillow Resample.c) ----

constexpr int kPrecisionBits = 32 - 8 - 2;

inline double triangle_filter(double x) {
    if (x < 0.0) x = -x;
    return x < 1.0 ? 1.0 - x : 0.0;
}

inline uint8_t clip8(int32_t v) {
    v >>= kPrecisionBits;
    if (v < 0) return 0;
    if (v > 255) return 255;
    return (uint8_t)v;
}

// Fixed-point filter coefficients for output indices [lo, hi) of a
// in_size -> out_size resize (PIL precompute_coeffs + normalize_8bpc).
struct Coeffs {
    int ksize = 0;
    std::vector<int> xmin, xmax;      // per output index in [lo, hi)
    std::vector<int32_t> k;           // (hi - lo) * ksize
};

Coeffs precompute_coeffs(int in_size, int out_size, int lo, int hi) {
    const double scale = (double)in_size / out_size;
    const double filterscale = scale < 1.0 ? 1.0 : scale;
    const double support = 1.0 * filterscale;   // bilinear support = 1.0
    const double ss = 1.0 / filterscale;

    Coeffs c;
    c.ksize = (int)std::ceil(support) * 2 + 1;
    const int n = hi - lo;
    c.xmin.resize(n);
    c.xmax.resize(n);
    c.k.assign((size_t)n * c.ksize, 0);
    std::vector<double> w(c.ksize);

    for (int i = 0; i < n; ++i) {
        const double center = (lo + i + 0.5) * scale;
        int xmin = (int)(center - support + 0.5);
        if (xmin < 0) xmin = 0;
        int xmax = (int)(center + support + 0.5);
        if (xmax > in_size) xmax = in_size;
        xmax -= xmin;
        double ww = 0.0;
        for (int x = 0; x < xmax; ++x) {
            w[x] = triangle_filter((x + xmin - center + 0.5) * ss);
            ww += w[x];
        }
        int32_t* kk = &c.k[(size_t)i * c.ksize];
        for (int x = 0; x < xmax; ++x) {
            const double v = ww != 0.0 ? w[x] / ww : w[x];
            kk[x] = (int32_t)(v < 0 ? v * (1 << kPrecisionBits) - 0.5
                                    : v * (1 << kPrecisionBits) + 0.5);
        }
        c.xmin[i] = xmin;
        c.xmax[i] = xmax;
    }
    return c;
}

}  // namespace

extern "C" {

// Load one JPEG: resize shorter side to `resize_to` (PIL-exact
// antialiased bilinear), center crop `crop`, normalize
// ((x/255 - mean) / std), write (crop, crop, 3) float32 NHWC into out.
// Returns 0 on success.
int ttdata_load_eval(const char* path, float* out, int crop, int resize_to,
                     const float* mean, const float* stddev) {
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    if (!decode_rgb(path, rgb, w, h)) return 1;

    // resize shorter side to resize_to; the long edge TRUNCATES like
    // torchvision Resize(int) (`int(size * long / short)`) and the
    // Python pipeline (data/transforms.py::_resize_shorter)
    int ow, oh;
    if (w <= h) {
        ow = resize_to;
        oh = (int)((double)resize_to * h / w);
        if (oh < 1) oh = 1;
    } else {
        oh = resize_to;
        ow = (int)((double)resize_to * w / h);
        if (ow < 1) ow = 1;
    }
    if (ow < crop || oh < crop) return 2;

    // center-crop window in resized coords (round-half-even)
    const int left = (int)std::nearbyint((ow - crop) / 2.0);
    const int top = (int)std::nearbyint((oh - crop) / 2.0);

    // vertical coefficients for output rows [top, top+crop) determine
    // which source rows the horizontal pass must produce
    const bool need_v = oh != h;
    const bool need_h = ow != w;
    Coeffs vc;
    int ry0 = top, ry1 = top + crop;   // needed row range in source coords
    if (need_v) {
        vc = precompute_coeffs(h, oh, top, top + crop);
        ry0 = vc.xmin[0];
        ry1 = vc.xmin[crop - 1] + vc.xmax[crop - 1];
    }

    // horizontal pass: rows [ry0, ry1) of the source, output columns
    // [left, left+crop) -> uint8 intermediate (PIL clips between passes)
    const int rows = ry1 - ry0;
    std::vector<uint8_t> mid((size_t)rows * crop * 3);
    if (need_h) {
        Coeffs hc = precompute_coeffs(w, ow, left, left + crop);
        for (int y = 0; y < rows; ++y) {
            const uint8_t* src = rgb.data() + (size_t)(ry0 + y) * w * 3;
            uint8_t* dst = mid.data() + (size_t)y * crop * 3;
            for (int x = 0; x < crop; ++x) {
                const int32_t* kk = &hc.k[(size_t)x * hc.ksize];
                const int x0 = hc.xmin[x];
                int32_t s0 = 1 << (kPrecisionBits - 1);
                int32_t s1 = s0, s2 = s0;
                for (int i = 0; i < hc.xmax[x]; ++i) {
                    const uint8_t* p = src + (size_t)(x0 + i) * 3;
                    s0 += (int32_t)p[0] * kk[i];
                    s1 += (int32_t)p[1] * kk[i];
                    s2 += (int32_t)p[2] * kk[i];
                }
                dst[(size_t)x * 3 + 0] = clip8(s0);
                dst[(size_t)x * 3 + 1] = clip8(s1);
                dst[(size_t)x * 3 + 2] = clip8(s2);
            }
        }
    } else {
        for (int y = 0; y < rows; ++y)
            std::memcpy(mid.data() + (size_t)y * crop * 3,
                        rgb.data() + ((size_t)(ry0 + y) * w + left) * 3,
                        (size_t)crop * 3);
    }

    // vertical pass + normalize
    for (int y = 0; y < crop; ++y) {
        float* dst = out + (size_t)y * crop * 3;
        if (need_v) {
            const int32_t* kk = &vc.k[(size_t)y * vc.ksize];
            const int y0 = vc.xmin[y] - ry0;
            for (int x = 0; x < crop; ++x) {
                int32_t s0 = 1 << (kPrecisionBits - 1);
                int32_t s1 = s0, s2 = s0;
                for (int i = 0; i < vc.xmax[y]; ++i) {
                    const uint8_t* p =
                        mid.data() + ((size_t)(y0 + i) * crop + x) * 3;
                    s0 += (int32_t)p[0] * kk[i];
                    s1 += (int32_t)p[1] * kk[i];
                    s2 += (int32_t)p[2] * kk[i];
                }
                dst[(size_t)x * 3 + 0] =
                    (clip8(s0) / 255.0f - mean[0]) / stddev[0];
                dst[(size_t)x * 3 + 1] =
                    (clip8(s1) / 255.0f - mean[1]) / stddev[1];
                dst[(size_t)x * 3 + 2] =
                    (clip8(s2) / 255.0f - mean[2]) / stddev[2];
            }
        } else {
            const uint8_t* p = mid.data() + (size_t)(y + top - ry0) * crop * 3;
            for (int x = 0; x < crop; ++x)
                for (int c3 = 0; c3 < 3; ++c3)
                    dst[(size_t)x * 3 + c3] =
                        (p[(size_t)x * 3 + c3] / 255.0f - mean[c3])
                        / stddev[c3];
        }
    }
    return 0;
}

// Batch variant: n paths (NUL-separated), output (n, crop, crop, 3).
// Returns the number of successfully decoded images; failures leave
// zeros and set fail_mask[i] = 1.
int ttdata_load_eval_batch(const char* paths, int n, float* out, int crop,
                           int resize_to, const float* mean,
                           const float* stddev, uint8_t* fail_mask) {
    const char* p = paths;
    int ok = 0;
    const size_t stride = (size_t)crop * crop * 3;
    for (int i = 0; i < n; ++i) {
        int rc = ttdata_load_eval(p, out + i * stride, crop, resize_to,
                                  mean, stddev);
        fail_mask[i] = rc == 0 ? 0 : 1;
        if (rc == 0) ++ok;
        else std::memset(out + i * stride, 0, stride * sizeof(float));
        p += std::strlen(p) + 1;
    }
    return ok;
}

}  // extern "C"
