// BeyondFF-TPU native host runtime: the data-loading hot path of the
// projection stage (depth PNG decode + resize, batched RLE decode).
//
// The reference feeds its GPU loop with per-frame cv2.imread / python RLE
// loops (reference: tools/projection_2d_to_3d.py:413-445, tools/utils/
// rle_encode_decode.py:35-61). On TPU the device outruns a python host; this
// library keeps frame ingestion native and thread-parallel so host IO
// overlaps device compute. Exposed via ctypes (beyondff_tpu/utils/native.py).
//
// Build: g++ -O3 -march=native -shared -fPIC bff_native.cpp -o libbff_native.so -lz -lpthread

#include <cstdint>
#include <cstring>
#include <cstdio>
#include <cmath>
#include <vector>
#include <thread>
#include <zlib.h>

extern "C" {

// ----------------------------------------------------------------- RLE
// counts: alternating (1-based start, run length) pairs, concatenated for
// all masks; offsets[i]..offsets[i+1] delimit mask i's pairs. Output is a
// dense uint8 (n_masks, length) buffer.
int bff_rle_decode_batch(const int64_t* counts, const int64_t* offsets,
                         int n_masks, int64_t length, uint8_t* out) {
    for (int m = 0; m < n_masks; ++m) {
        uint8_t* row = out + (int64_t)m * length;
        memset(row, 0, length);
        for (int64_t k = offsets[m]; k + 1 < offsets[m + 1]; k += 2) {
            int64_t start = counts[k] - 1;
            int64_t run = counts[k + 1];
            if (start < 0 || start + run > length) return -1;
            memset(row + start, 1, run);
        }
    }
    return 0;
}

// 1-based RLE encode of a dense uint8 mask. Returns number of counts written
// (caller provides out sized 2*ceil(length/2)+2 worst case).
int64_t bff_rle_encode(const uint8_t* mask, int64_t length, int64_t* out) {
    int64_t n = 0;
    int64_t i = 0;
    while (i < length) {
        while (i < length && !mask[i]) ++i;
        if (i >= length) break;
        int64_t start = i;
        while (i < length && mask[i]) ++i;
        out[n++] = start + 1;
        out[n++] = i - start;
    }
    return n;
}

// ----------------------------------------------------------------- PNG
// Minimal 16-bit grayscale PNG reader (what ScanNet depth files are).
namespace {

inline uint32_t be32(const uint8_t* p) {
    return ((uint32_t)p[0] << 24) | ((uint32_t)p[1] << 16) | ((uint32_t)p[2] << 8) | p[3];
}

int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

struct PngInfo {
    uint32_t width = 0, height = 0;
    int bit_depth = 0, color_type = 0;
};

// Decode a 16-bit (or 8-bit) grayscale PNG buffer into uint16 pixels.
int decode_png_gray(const uint8_t* buf, int64_t size, PngInfo* info,
                    std::vector<uint16_t>& pixels) {
    static const uint8_t magic[8] = {137, 80, 78, 71, 13, 10, 26, 10};
    if (size < 8 || memcmp(buf, magic, 8) != 0) return -1;
    int64_t pos = 8;
    std::vector<uint8_t> idat;
    while (pos + 8 <= size) {
        uint32_t len = be32(buf + pos);
        const uint8_t* type = buf + pos + 4;
        const uint8_t* data = buf + pos + 8;
        if (pos + 12 + (int64_t)len > size) return -2;
        if (!memcmp(type, "IHDR", 4)) {
            info->width = be32(data);
            info->height = be32(data + 4);
            info->bit_depth = data[8];
            info->color_type = data[9];
            if (data[12] != 0) return -3;  // interlaced unsupported
            if (info->color_type != 0) return -4;  // grayscale only
        } else if (!memcmp(type, "IDAT", 4)) {
            idat.insert(idat.end(), data, data + len);
        } else if (!memcmp(type, "IEND", 4)) {
            break;
        }
        pos += 12 + len;
    }
    const int bpp = info->bit_depth / 8;  // bytes per pixel (1 or 2)
    const int64_t stride = (int64_t)info->width * bpp;
    std::vector<uint8_t> raw((stride + 1) * info->height);
    uLongf raw_len = raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK) return -5;

    pixels.resize((int64_t)info->width * info->height);
    std::vector<uint8_t> prev(stride, 0), cur(stride);
    for (uint32_t y = 0; y < info->height; ++y) {
        const uint8_t* line = raw.data() + (int64_t)y * (stride + 1);
        int filter = line[0];
        const uint8_t* src = line + 1;
        for (int64_t x = 0; x < stride; ++x) {
            int a = x >= bpp ? cur[x - bpp] : 0;
            int b = prev[x];
            int c = x >= bpp ? prev[x - bpp] : 0;
            int v = src[x];
            switch (filter) {
                case 0: break;
                case 1: v += a; break;
                case 2: v += b; break;
                case 3: v += (a + b) / 2; break;
                case 4: v += paeth(a, b, c); break;
                default: return -6;
            }
            cur[x] = (uint8_t)v;
        }
        uint16_t* dst = pixels.data() + (int64_t)y * info->width;
        if (bpp == 2) {
            for (uint32_t x = 0; x < info->width; ++x)
                dst[x] = ((uint16_t)cur[2 * x] << 8) | cur[2 * x + 1];  // PNG is BE
        } else {
            for (uint32_t x = 0; x < info->width; ++x) dst[x] = cur[x];
        }
        std::swap(prev, cur);
    }
    return 0;
}

// cv2-convention bilinear resize (half-pixel centers, edge clamp).
void resize_bilinear(const float* src, int sh, int sw, float* dst, int dh, int dw) {
    const float sx = (float)sw / dw, sy = (float)sh / dh;
    for (int y = 0; y < dh; ++y) {
        float fy = (y + 0.5f) * sy - 0.5f;
        int y0 = (int)floorf(fy);
        float wy = fy - y0;
        int y0c = y0 < 0 ? 0 : (y0 >= sh ? sh - 1 : y0);
        int y1c = y0 + 1 < 0 ? 0 : (y0 + 1 >= sh ? sh - 1 : y0 + 1);
        for (int x = 0; x < dw; ++x) {
            float fx = (x + 0.5f) * sx - 0.5f;
            int x0 = (int)floorf(fx);
            float wx = fx - x0;
            int x0c = x0 < 0 ? 0 : (x0 >= sw ? sw - 1 : x0);
            int x1c = x0 + 1 < 0 ? 0 : (x0 + 1 >= sw ? sw - 1 : x0 + 1);
            float v00 = src[y0c * sw + x0c], v01 = src[y0c * sw + x1c];
            float v10 = src[y1c * sw + x0c], v11 = src[y1c * sw + x1c];
            dst[y * dw + x] = v00 * (1 - wx) * (1 - wy) + v01 * wx * (1 - wy)
                            + v10 * (1 - wx) * wy + v11 * wx * wy;
        }
    }
}

}  // namespace

// Decode one 16-bit grayscale depth PNG (already read into memory), scale to
// meters, resize to (out_h, out_w). Returns 0 on success.
int bff_decode_depth(const uint8_t* png, int64_t png_size, float depth_scale,
                     int out_h, int out_w, float* out) {
    PngInfo info;
    std::vector<uint16_t> pixels;
    int rc = decode_png_gray(png, png_size, &info, pixels);
    if (rc != 0) return rc;
    std::vector<float> meters((int64_t)info.width * info.height);
    for (size_t i = 0; i < pixels.size(); ++i) meters[i] = pixels[i] / depth_scale;
    if ((int)info.height == out_h && (int)info.width == out_w) {
        memcpy(out, meters.data(), sizeof(float) * meters.size());
    } else {
        resize_bilinear(meters.data(), info.height, info.width, out, out_h, out_w);
    }
    return 0;
}

// Thread-parallel batch: n files, concatenated in one buffer with offsets.
int bff_decode_depth_batch(const uint8_t* blob, const int64_t* offsets, int n,
                           float depth_scale, int out_h, int out_w, float* out,
                           int n_threads) {
    std::vector<int> rcs(n, 0);
    auto work = [&](int t) {
        for (int i = t; i < n; i += n_threads) {
            rcs[i] = bff_decode_depth(blob + offsets[i], offsets[i + 1] - offsets[i],
                                      depth_scale, out_h, out_w,
                                      out + (int64_t)i * out_h * out_w);
        }
    };
    if (n_threads <= 1) {
        work(0);
    } else {
        std::vector<std::thread> threads;
        for (int t = 0; t < n_threads; ++t) threads.emplace_back(work, t);
        for (auto& th : threads) th.join();
    }
    for (int rc : rcs)
        if (rc != 0) return rc;
    return 0;
}

}  // extern "C"
