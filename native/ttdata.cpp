// ttdata: native ImageNet eval-path image loader.
//
// The reference's intended fast input path is the commented-out NVIDIA
// DALI pipeline (utils/preprocess.py:129-219); its live path is
// torchvision/PIL in 6 worker processes.  This is the TPU-framework
// equivalent: libjpeg decode -> bilinear resize (shorter side) ->
// center crop -> normalize, in one C pass per image, emitting NHWC
// float32 ready for device upload.  (Bilinear here is the plain
// non-antialiased kernel; the PIL path in data/transforms.py remains the
// bit-parity reference.)
//
// C ABI only (ctypes).

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

inline float lerp(float a, float b, float t) { return a + (b - a) * t; }

}  // namespace

extern "C" {

// Load one JPEG: resize shorter side to `resize_to` (bilinear), center
// crop `crop`, normalize ((x/255 - mean) / std), write (crop, crop, 3)
// float32 NHWC into out.  Returns 0 on success.
int ttdata_load_eval(const char* path, float* out, int crop, int resize_to,
                     const float* mean, const float* stddev) {
    std::vector<uint8_t> rgb;
    int w = 0, h = 0;
    if (!decode_rgb(path, rgb, w, h)) return 1;

    // resize shorter side to resize_to (keeping aspect)
    int ow, oh;
    if (w <= h) {
        ow = resize_to;
        oh = (int)((int64_t)resize_to * h / w);
        if (oh < 1) oh = 1;
    } else {
        oh = resize_to;
        ow = (int)((int64_t)resize_to * w / h);
        if (ow < 1) ow = 1;
    }
    if (ow < crop || oh < crop) return 2;

    // center-crop window in resized coords
    const int left = (ow - crop + 1) / 2;
    const int top = (oh - crop + 1) / 2;

    const float sx = (float)w / ow;
    const float sy = (float)h / oh;

    for (int y = 0; y < crop; ++y) {
        // align_corners=false bilinear sampling
        float fy = ((top + y) + 0.5f) * sy - 0.5f;
        if (fy < 0) fy = 0;
        int y0 = (int)fy;
        int y1 = y0 + 1 < h ? y0 + 1 : h - 1;
        float ty = fy - y0;
        for (int x = 0; x < crop; ++x) {
            float fx = ((left + x) + 0.5f) * sx - 0.5f;
            if (fx < 0) fx = 0;
            int x0 = (int)fx;
            int x1 = x0 + 1 < w ? x0 + 1 : w - 1;
            float tx = fx - x0;
            for (int c = 0; c < 3; ++c) {
                const float p00 = rgb[((size_t)y0 * w + x0) * 3 + c];
                const float p01 = rgb[((size_t)y0 * w + x1) * 3 + c];
                const float p10 = rgb[((size_t)y1 * w + x0) * 3 + c];
                const float p11 = rgb[((size_t)y1 * w + x1) * 3 + c];
                const float v =
                    lerp(lerp(p00, p01, tx), lerp(p10, p11, tx), ty);
                out[((size_t)y * crop + x) * 3 + c] =
                    (v / 255.0f - mean[c]) / stddev[c];
            }
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
