// mia_host — native host runtime for mia_tpu.
//
// The reference delegates its host-bound work to C/C++ library kernels
// inside torch DataLoader worker PROCESSES (SURVEY §2.8). Here the host
// runtime is a small C++ library driven through ctypes:
//
//   * PNG/JPEG decode + PIL-convolution-style resize + normalize — the
//     data-loader hot path (replaces per-sample PIL in Python threads).
//     Batch API runs a std::thread pool.
//   * Exact 2-D squared EDT (Felzenszwalb–Huttenlocher) — independent host
//     cross-check for the device EDT/surface-distance kernels.
//   * Label-Studio brush RLE encode/decode — bit-level codec that is
//     word-at-a-time here instead of Python string bits.
//
// Build: g++ -O3 -fPIC -shared mia_host.cpp -o libmia_host.so -lpng -ljpeg -lpthread
// (driven by mia_tpu/native/__init__.py at import time).

#include <png.h>
#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// image decoding
// ---------------------------------------------------------------------------

// Decode PNG or JPEG into grayscale float32 [0,1]. Returns 0 on success.
// Caller provides out sized h*w after calling probe (or uses decode_gray_alloc).
static int decode_png_gray(FILE* fp, std::vector<float>& out, int* h, int* w) {
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    if (!png) return 1;
    png_infop info = png_create_info_struct(png);
    if (!info) { png_destroy_read_struct(&png, nullptr, nullptr); return 1; }
    if (setjmp(png_jmpbuf(png))) { png_destroy_read_struct(&png, &info, nullptr); return 1; }
    png_init_io(png, fp);
    png_read_info(png, info);

    png_uint_32 width = png_get_image_width(png, info);
    png_uint_32 height = png_get_image_height(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);

    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
    // ITU-R 601 luma like PIL convert("L")
    if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
        color == PNG_COLOR_TYPE_PALETTE)
        png_set_rgb_to_gray(png, 1, 0.299, 0.587);
    png_read_update_info(png, info);

    std::vector<png_bytep> rows(height);
    std::vector<unsigned char> data((size_t)width * height);
    for (png_uint_32 y = 0; y < height; y++) rows[y] = data.data() + (size_t)y * width;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);

    out.resize((size_t)width * height);
    for (size_t i = 0; i < out.size(); i++) out[i] = data[i] / 255.0f;
    *h = (int)height;
    *w = (int)width;
    return 0;
}

static int decode_jpeg_gray(FILE* fp, std::vector<float>& out, int* h, int* w) {
    jpeg_decompress_struct cinfo;
    jpeg_error_mgr jerr;
    cinfo.err = jpeg_std_error(&jerr);
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, fp);
    if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
        jpeg_destroy_decompress(&cinfo);
        return 1;
    }
    cinfo.out_color_space = JCS_GRAYSCALE;
    jpeg_start_decompress(&cinfo);
    int width = cinfo.output_width, height = cinfo.output_height;
    out.resize((size_t)width * height);
    std::vector<unsigned char> row(width);
    unsigned char* rp = row.data();
    for (int y = 0; y < height; y++) {
        jpeg_read_scanlines(&cinfo, &rp, 1);
        for (int x = 0; x < width; x++) out[(size_t)y * width + x] = row[x] / 255.0f;
    }
    jpeg_finish_decompress(&cinfo);
    jpeg_destroy_decompress(&cinfo);
    *h = height;
    *w = width;
    return 0;
}

static int decode_gray(const char* path, std::vector<float>& out, int* h, int* w) {
    FILE* fp = fopen(path, "rb");
    if (!fp) return 1;
    unsigned char magic[2] = {0, 0};
    if (fread(magic, 1, 2, fp) != 2) { fclose(fp); return 1; }
    rewind(fp);
    int rc;
    if (magic[0] == 0x89 && magic[1] == 'P') rc = decode_png_gray(fp, out, h, w);
    else rc = decode_jpeg_gray(fp, out, h, w);
    fclose(fp);
    return rc;
}

// ---------------------------------------------------------------------------
// PIL-convolution-style separable resize ("bilinear" = triangle filter whose
// support scales with the downscale factor — PIL Image.resize semantics)
// ---------------------------------------------------------------------------

static void resample_axis(const float* src, float* dst, int in_len, int out_len,
                          int stride_in, int stride_out, int lines,
                          int line_stride_in, int line_stride_out, bool nearest) {
    if (in_len == out_len) {
        for (int l = 0; l < lines; l++)
            for (int i = 0; i < out_len; i++)
                dst[(size_t)l * line_stride_out + i * stride_out] =
                    src[(size_t)l * line_stride_in + i * stride_in];
        return;
    }
    double scale = (double)in_len / out_len;
    if (nearest) {
        for (int i = 0; i < out_len; i++) {
            int s = std::min((int)(( i + 0.5) * scale), in_len - 1);
            for (int l = 0; l < lines; l++)
                dst[(size_t)l * line_stride_out + i * stride_out] =
                    src[(size_t)l * line_stride_in + s * stride_in];
        }
        return;
    }
    double filterscale = std::max(scale, 1.0);
    double support = 1.0 * filterscale;  // triangle filter support
    int ksize = (int)std::ceil(support) * 2 + 1;
    std::vector<double> coeffs((size_t)out_len * ksize);
    std::vector<int> bounds((size_t)out_len * 2);
    for (int i = 0; i < out_len; i++) {
        double center = (i + 0.5) * scale;
        int xmin = (int)std::max(center - support + 0.5, 0.0);
        int xmax = std::min((int)(center + support + 0.5), in_len);
        double* k = &coeffs[(size_t)i * ksize];
        double total = 0.0;
        for (int x = xmin; x < xmax; x++) {
            double arg = (x - center + 0.5) / filterscale;
            double wgt = (std::abs(arg) < 1.0) ? 1.0 - std::abs(arg) : 0.0;
            k[x - xmin] = wgt;
            total += wgt;
        }
        if (total != 0.0)
            for (int x = 0; x < xmax - xmin; x++) k[x - 0] /= total;
        bounds[i * 2] = xmin;
        bounds[i * 2 + 1] = xmax - xmin;
    }
    for (int l = 0; l < lines; l++) {
        const float* sline = src + (size_t)l * line_stride_in;
        float* dline = dst + (size_t)l * line_stride_out;
        for (int i = 0; i < out_len; i++) {
            int xmin = bounds[i * 2], cnt = bounds[i * 2 + 1];
            const double* k = &coeffs[(size_t)i * ksize];
            double acc = 0.0;
            for (int x = 0; x < cnt; x++)
                acc += sline[(size_t)(xmin + x) * stride_in] * k[x];
            dline[(size_t)i * stride_out] = (float)acc;
        }
    }
}

// Resize (h, w) float image to (oh, ow). mode 0 = bilinear, 1 = nearest.
static void resize_gray(const std::vector<float>& img, int h, int w,
                        float* out, int oh, int ow, int mode) {
    std::vector<float> tmp((size_t)h * ow);
    // horizontal: lines = h, along w
    resample_axis(img.data(), tmp.data(), w, ow, 1, 1, h, w, ow, mode == 1);
    // vertical: lines = ow, along h (stride = ow)
    resample_axis(tmp.data(), out, h, oh, ow, ow, ow, 1, 1, mode == 1);
}

// Load one grayscale image resized to (oh, ow), repeated over `channels`
// (HWC float32 in [0,1]). Returns 0 on success.
int load_image_gray_resized(const char* path, float* out, int oh, int ow, int channels) {
    std::vector<float> img;
    int h, w;
    if (decode_gray(path, img, &h, &w)) return 1;
    std::vector<float> resized((size_t)oh * ow);
    resize_gray(img, h, w, resized.data(), oh, ow, 0);
    for (int i = 0; i < oh * ow; i++) {
        float v = std::min(std::max(resized[i], 0.0f), 1.0f);
        for (int c = 0; c < channels; c++) out[(size_t)i * channels + c] = v;
    }
    return 0;
}

// Load a label image nearest-resized to (oh, ow) as int32 raw values.
int load_label_resized(const char* path, int32_t* out, int oh, int ow) {
    std::vector<float> img;
    int h, w;
    if (decode_gray(path, img, &h, &w)) return 1;
    std::vector<float> resized((size_t)oh * ow);
    resize_gray(img, h, w, resized.data(), oh, ow, 1);
    for (int i = 0; i < oh * ow; i++)
        out[i] = (int32_t)std::lround(resized[i] * 255.0f);
    return 0;
}

// Threaded batch load: n samples, images (n, oh, ow, channels) and
// optionally labels (n, oh, ow). Returns number of failures.
int load_batch(const char** image_paths, const char** label_paths, int n,
               float* images, int32_t* labels, int oh, int ow, int channels,
               int num_threads) {
    if (num_threads < 1) num_threads = 1;
    std::vector<int> failures(num_threads, 0);
    auto worker = [&](int t) {
        for (int i = t; i < n; i += num_threads) {
            if (load_image_gray_resized(image_paths[i],
                                        images + (size_t)i * oh * ow * channels,
                                        oh, ow, channels))
                failures[t]++;
            if (label_paths && labels &&
                load_label_resized(label_paths[i], labels + (size_t)i * oh * ow, oh, ow))
                failures[t]++;
        }
    };
    std::vector<std::thread> threads;
    for (int t = 0; t < num_threads; t++) threads.emplace_back(worker, t);
    for (auto& th : threads) th.join();
    int total = 0;
    for (int f : failures) total += f;
    return total;
}

// ---------------------------------------------------------------------------
// exact squared EDT (Felzenszwalb–Huttenlocher) — host cross-check kernel
// ---------------------------------------------------------------------------

static void edt_1d(const double* f, double* d, int n, std::vector<int>& v,
                   std::vector<double>& z) {
    int k = 0;
    v[0] = 0;
    z[0] = -1e30;
    z[1] = 1e30;
    for (int q = 1; q < n; q++) {
        double s;
        while (true) {
            s = ((f[q] + q * (double)q) - (f[v[k]] + v[k] * (double)v[k])) /
                (2.0 * q - 2.0 * v[k]);
            if (s <= z[k]) k--;
            else break;
        }
        k++;
        v[k] = q;
        z[k] = s;
        z[k + 1] = 1e30;
    }
    k = 0;
    for (int q = 0; q < n; q++) {
        while (z[k + 1] < q) k++;
        double dq = q - (double)v[k];
        d[q] = dq * dq + f[v[k]];
    }
}

// Squared euclidean distance to the nearest TRUE pixel of `feature` (h, w),
// with anisotropic spacing (sy, sx). INF where no feature exists.
void squared_edt_2d(const uint8_t* feature, int h, int w, double sy, double sx,
                    float* out) {
    const double BIG = 1e30;
    std::vector<double> f((size_t)h * w);
    for (int i = 0; i < h * w; i++) f[i] = feature[i] ? 0.0 : BIG;

    std::vector<double> col(h), dcol(h);
    std::vector<int> v(std::max(h, w));
    std::vector<double> z(std::max(h, w) + 1);
    // columns (y axis, spacing sy): run EDT on f/sy^2 then scale back
    double sy2 = sy * sy, sx2 = sx * sx;
    for (int x = 0; x < w; x++) {
        for (int y = 0; y < h; y++) col[y] = f[(size_t)y * w + x] / sy2;
        edt_1d(col.data(), dcol.data(), h, v, z);
        for (int y = 0; y < h; y++) f[(size_t)y * w + x] = dcol[y] * sy2;
    }
    std::vector<double> row(w), drow(w);
    for (int y = 0; y < h; y++) {
        for (int x = 0; x < w; x++) row[x] = f[(size_t)y * w + x] / sx2;
        edt_1d(row.data(), drow.data(), w, v, z);
        for (int x = 0; x < w; x++)
            out[(size_t)y * w + x] = (float)std::min(drow[x] * sx2, BIG);
    }
}

// ---------------------------------------------------------------------------
// Label-Studio brush RLE (bit-level), word-at-a-time
// ---------------------------------------------------------------------------

struct BitWriter {
    std::vector<uint8_t> bytes;
    uint32_t acc = 0;
    int nbits = 0;
    void put(uint32_t value, int bits) {
        for (int i = bits - 1; i >= 0; i--) {
            acc = (acc << 1) | ((value >> i) & 1);
            if (++nbits == 8) {
                bytes.push_back((uint8_t)acc);
                acc = 0;
                nbits = 0;
            }
        }
    }
    void flush() {
        if (nbits) {
            bytes.push_back((uint8_t)(acc << (8 - nbits)));
            acc = 0;
            nbits = 0;
        }
    }
};

struct BitReader {
    const uint8_t* data;
    long nbytes;
    long pos = 0;  // bit position
    uint32_t get(int bits) {
        uint32_t out = 0;
        for (int i = 0; i < bits; i++) {
            long byte = pos >> 3;
            int off = 7 - (int)(pos & 7);
            out = (out << 1) | ((data[byte] >> off) & 1);
            pos++;
        }
        return out;
    }
};

// Encode `n` bytes into brush RLE. Returns byte length written to `out`
// (caller allocates generously: 2*n + 64 is always enough).
long brush_rle_encode(const uint8_t* arr, long n, uint8_t* out) {
    BitWriter bw;
    bw.put((uint32_t)n, 32);
    bw.put(7, 5);  // wordsize-1
    for (int s : {3, 4, 8, 16}) bw.put(s - 1, 4);

    long i = 0;
    while (i < n) {
        long j = i;
        while (j + 1 < n && arr[j + 1] == arr[i]) j++;
        long length = j - i + 1;
        uint8_t value = arr[i];
        if (length == 1) {
            bw.put(0, 1); bw.put(0, 2); bw.put(0, 3); bw.put(value, 8);
        } else if (length <= 8) {
            bw.put(1, 1); bw.put(0, 2); bw.put((uint32_t)(length - 1), 3); bw.put(value, 8);
        } else if (length <= 16) {
            bw.put(1, 1); bw.put(1, 2); bw.put((uint32_t)(length - 1), 4); bw.put(value, 8);
        } else if (length <= 256) {
            bw.put(1, 1); bw.put(2, 2); bw.put((uint32_t)(length - 1), 8); bw.put(value, 8);
        } else {
            while (length > 65536) {
                bw.put(1, 1); bw.put(3, 2); bw.put(65535, 16); bw.put(value, 8);
                length -= 65536;
            }
            if (length > 0) {
                bw.put(1, 1); bw.put(3, 2); bw.put((uint32_t)(length - 1), 16); bw.put(value, 8);
            }
        }
        i = j + 1;
    }
    bw.flush();
    memcpy(out, bw.bytes.data(), bw.bytes.size());
    return (long)bw.bytes.size();
}

// Decode brush RLE bytes into `out` (caller allocates via the embedded
// 32-bit count; call brush_rle_decoded_size first). Returns count or -1.
long brush_rle_decoded_size(const uint8_t* rle, long nbytes) {
    if (nbytes < 4) return -1;
    return ((long)rle[0] << 24) | ((long)rle[1] << 16) | ((long)rle[2] << 8) | rle[3];
}

long brush_rle_decode(const uint8_t* rle, long nbytes, uint8_t* out, long out_len) {
    BitReader br{rle, nbytes};
    long num = br.get(32);
    if (num > out_len) return -1;
    int word_size = (int)br.get(5) + 1;
    int sizes[4];
    for (int s = 0; s < 4; s++) sizes[s] = (int)br.get(4) + 1;
    long i = 0;
    while (i < num) {
        uint32_t x = br.get(1);
        long j = i + 1 + br.get(sizes[br.get(2)]);
        if (j > num) j = num;
        if (x) {
            uint8_t val = (uint8_t)br.get(word_size);
            for (; i < j; i++) out[i] = val;
        } else {
            for (; i < j; i++) out[i] = (uint8_t)br.get(word_size);
        }
    }
    return num;
}

}  // extern "C"
