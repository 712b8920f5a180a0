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

#include <algorithm>
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

// ----------------------------------------------------------------- JPEG
// Baseline-JPEG ENTROPY decoder: markers + Huffman + MCU loop only — no
// IDCT, no upsampling, no color conversion. The quantized DCT coefficients
// it recovers are the sparsest exact representation of the file's content
// (~0.2-0.7 B/px packed for natural images vs 1.5 B/px YCrCb 4:2:0), so the
// seg2d frame transport ships THEM across the host->TPU link and the device
// finishes decoding (dequant + 8x8 IDCT on the MXU + chroma upsample,
// core/jxt.py). Reference frames are exactly these files (ScanNet
// color/*.jpg, reference tools/segmentation_2d.py:247-254).
//
// Supports what libjpeg writers (cv2, ScanNet exports) produce: baseline or
// extended-sequential DCT (SOF0/SOF1), 8-bit quant tables (16-bit accepted),
// 1-4 components, any sampling factors, restart markers, interleaved scans
// (plus single-component scans for grayscale). Progressive returns an error
// and the caller falls back to the YCrCb transport.
namespace {

struct HuffTable {
    // JPEG spec F.2.2.3 decode tables
    int32_t mincode[17];
    int32_t maxcode[18];  // maxcode[l] = -1 when no codes of length l
    int32_t valptr[17];
    uint8_t huffval[256];
    bool defined = false;
};

struct JpegBitReader {
    const uint8_t* p;
    const uint8_t* end;
    uint32_t acc = 0;
    int nbits = 0;
    bool hit_marker = false;  // saw a non-RST, non-stuffing marker

    int next_bit() {
        if (nbits == 0) {
            if (p >= end) { hit_marker = true; return 0; }
            uint8_t b = *p++;
            if (b == 0xFF) {
                if (p >= end) { hit_marker = true; return 0; }
                uint8_t b2 = *p++;
                if (b2 != 0x00) {  // real marker terminates entropy data
                    p -= 2;
                    hit_marker = true;
                    return 0;
                }
            }
            acc = b;
            nbits = 8;
        }
        nbits--;
        return (acc >> nbits) & 1;
    }

    int receive(int s) {
        int v = 0;
        for (int i = 0; i < s; ++i) v = (v << 1) | next_bit();
        return v;
    }

    void byte_align() { nbits = 0; }
};

inline int huff_decode(JpegBitReader& br, const HuffTable& t) {
    int code = br.next_bit();
    int l = 1;
    while (code > t.maxcode[l]) {
        if (++l > 16 || br.hit_marker) return -1;
        code = (code << 1) | br.next_bit();
    }
    return t.huffval[t.valptr[l] + code - t.mincode[l]];
}

inline int extend(int v, int s) {
    // F.2.2.1: map magnitude code to signed value
    return (s && v < (1 << (s - 1))) ? v - (1 << s) + 1 : v;
}

void build_huff(const uint8_t* bits /*[16]*/, const uint8_t* vals, int nvals,
                HuffTable* t) {
    // generate codes in order (spec C.2) then the F.2.2.3 decode arrays
    int code = 0, k = 0;
    for (int l = 1; l <= 16; ++l) {
        if (bits[l - 1] == 0) {
            t->maxcode[l] = -1;
            t->mincode[l] = 0;
            t->valptr[l] = 0;
        } else {
            t->valptr[l] = k;
            t->mincode[l] = code;
            code += bits[l - 1];
            k += bits[l - 1];
            t->maxcode[l] = code - 1;
        }
        code <<= 1;
    }
    t->maxcode[17] = 0x7fffffff;
    memcpy(t->huffval, vals, nvals > 256 ? 256 : nvals);
    t->defined = true;
}

const uint8_t kZigzag[64] = {
    0,  1,  8,  16, 9,  2,  3,  10, 17, 24, 32, 25, 18, 11, 4,  5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6,  7,  14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63};

struct JpegComp {
    int id = 0, h = 1, v = 1, tq = 0;
    int td = 0, ta = 0;       // scan Huffman table ids
    int bw = 0, bh = 0;       // full padded block grid (MCU-aligned)
    int dc_pred = 0;
};

struct JpegState {
    int width = 0, height = 0, ncomp = 0, precision = 8;
    int hmax = 1, vmax = 1, mcux = 0, mcuy = 0;
    int restart_interval = 0;
    JpegComp comp[4];
    uint16_t qtab[4][64];  // natural order
    HuffTable dc[4], ac[4];
    const uint8_t* scan_data = nullptr;  // first entropy byte of first scan
    int scan_ncomp = 0;
    int scan_comp_idx[4] = {0, 0, 0, 0};
};

inline int ju16(const uint8_t* p) { return (p[0] << 8) | p[1]; }

// Parse headers up to (and including) the first SOS. Returns 0 or a
// negative error (-20 progressive / unsupported coding, -21 malformed).
int jpeg_parse(const uint8_t* buf, int64_t size, JpegState* st) {
    if (size < 4 || buf[0] != 0xFF || buf[1] != 0xD8) return -21;
    int64_t pos = 2;
    while (pos + 4 <= size) {
        if (buf[pos] != 0xFF) return -21;
        uint8_t m = buf[pos + 1];
        if (m == 0xFF) { pos++; continue; }  // fill bytes
        if (m == 0x01 || (m >= 0xD0 && m <= 0xD7)) { pos += 2; continue; }
        int len = ju16(buf + pos + 2);
        if (len < 2 || pos + 2 + len > size) return -21;
        const uint8_t* d = buf + pos + 4;
        int dlen = len - 2;
        if (m == 0xDB) {  // DQT
            int off = 0;
            while (off < dlen) {
                int pq = d[off] >> 4, tq = d[off] & 15;
                if (tq > 3) return -21;
                off++;
                for (int i = 0; i < 64; ++i) {
                    int v = pq ? ju16(d + off + 2 * i) : d[off + i];
                    st->qtab[tq][kZigzag[i]] = (uint16_t)v;
                }
                off += pq ? 128 : 64;
            }
        } else if (m == 0xC4) {  // DHT
            int off = 0;
            while (off + 17 <= dlen) {
                int tc = d[off] >> 4, th = d[off] & 15;
                if (th > 3) return -21;
                const uint8_t* bits = d + off + 1;
                int nv = 0;
                for (int l = 0; l < 16; ++l) nv += bits[l];
                if (off + 17 + nv > dlen) return -21;
                build_huff(bits, d + off + 17, nv,
                           tc ? &st->ac[th] : &st->dc[th]);
                off += 17 + nv;
            }
        } else if (m == 0xC0 || m == 0xC1) {  // SOF0/SOF1
            st->precision = d[0];
            st->height = ju16(d + 1);
            st->width = ju16(d + 3);
            st->ncomp = d[5];
            if (st->ncomp < 1 || st->ncomp > 4) return -21;
            for (int i = 0; i < st->ncomp; ++i) {
                st->comp[i].id = d[6 + 3 * i];
                st->comp[i].h = d[7 + 3 * i] >> 4;
                st->comp[i].v = d[7 + 3 * i] & 15;
                st->comp[i].tq = d[8 + 3 * i];
                if (st->comp[i].h < 1 || st->comp[i].v < 1 ||
                    st->comp[i].h > 4 || st->comp[i].v > 4 ||
                    st->comp[i].tq > 3)
                    return -21;
                if (st->comp[i].h > st->hmax) st->hmax = st->comp[i].h;
                if (st->comp[i].v > st->vmax) st->vmax = st->comp[i].v;
            }
            st->mcux = (st->width + 8 * st->hmax - 1) / (8 * st->hmax);
            st->mcuy = (st->height + 8 * st->vmax - 1) / (8 * st->vmax);
            for (int i = 0; i < st->ncomp; ++i) {
                st->comp[i].bw = st->mcux * st->comp[i].h;
                st->comp[i].bh = st->mcuy * st->comp[i].v;
            }
        } else if (m == 0xC2 || (m >= 0xC3 && m <= 0xCF && m != 0xC4 &&
                                 m != 0xC8 && m != 0xCC)) {
            return -20;  // progressive / arithmetic / hierarchical
        } else if (m == 0xDD) {  // DRI
            st->restart_interval = ju16(d);
        } else if (m == 0xDA) {  // SOS
            if (st->width == 0) return -21;
            st->scan_ncomp = d[0];
            for (int i = 0; i < st->scan_ncomp; ++i) {
                int cid = d[1 + 2 * i];
                int ci = -1;
                for (int j = 0; j < st->ncomp; ++j)
                    if (st->comp[j].id == cid) ci = j;
                if (ci < 0) return -21;
                st->scan_comp_idx[i] = ci;
                st->comp[ci].td = d[2 + 2 * i] >> 4;
                st->comp[ci].ta = d[2 + 2 * i] & 15;
            }
            st->scan_data = buf + pos + 2 + len;
            return 0;
        } else if (m == 0xD9) {
            return -21;  // EOI before SOS
        }
        pos += 2 + len;
    }
    return -21;
}

// Decode one block's coefficients into out[64] (natural order, quantized).
inline bool jpeg_decode_block(JpegBitReader& br, JpegState* st, JpegComp* c,
                              int16_t* out) {
    const HuffTable& dct = st->dc[c->td];
    const HuffTable& act = st->ac[c->ta];
    if (!dct.defined || !act.defined) return false;
    int t = huff_decode(br, dct);
    if (t < 0 || t > 15) return false;
    c->dc_pred += extend(br.receive(t), t);
    out[0] = (int16_t)c->dc_pred;
    int k = 1;
    while (k < 64) {
        int rs = huff_decode(br, act);
        if (rs < 0) return false;
        int r = rs >> 4, s = rs & 15;
        if (s == 0) {
            if (r != 15) break;  // EOB
            k += 16;             // ZRL
        } else {
            k += r;
            if (k > 63) return false;
            out[kZigzag[k]] = (int16_t)extend(br.receive(s), s);
            k++;
        }
        if (br.hit_marker) break;
    }
    return true;
}

// Entropy-decode the first scan into per-component dense coefficient grids
// (natural order within blocks, blocks row-major over the padded grid).
int jpeg_decode_coeffs(JpegState* st, const uint8_t* buf_end,
                       int16_t* outs[4]) {
    JpegBitReader br{st->scan_data, buf_end};
    int mcus_done = 0;
    auto handle_restart = [&]() -> bool {
        if (st->restart_interval == 0) return true;
        if (mcus_done % st->restart_interval != 0 || mcus_done == 0) return true;
        br.byte_align();
        br.hit_marker = false;
        // skip fill bytes then the RSTn marker
        while (br.p + 1 < br.end && br.p[0] == 0xFF &&
               (br.p[1] >= 0xD0 && br.p[1] <= 0xD7))
            br.p += 2;
        for (int i = 0; i < st->ncomp; ++i) st->comp[i].dc_pred = 0;
        return true;
    };
    if (st->scan_ncomp > 1) {  // interleaved
        for (int my = 0; my < st->mcuy; ++my)
            for (int mx = 0; mx < st->mcux; ++mx) {
                if (!handle_restart()) return -22;
                for (int s = 0; s < st->scan_ncomp; ++s) {
                    JpegComp* c = &st->comp[st->scan_comp_idx[s]];
                    for (int v = 0; v < c->v; ++v)
                        for (int h = 0; h < c->h; ++h) {
                            int bx = mx * c->h + h, by = my * c->v + v;
                            int16_t* out = outs[st->scan_comp_idx[s]] +
                                           ((int64_t)by * c->bw + bx) * 64;
                            if (!jpeg_decode_block(br, st, c, out)) return -22;
                        }
                }
                mcus_done++;
            }
    } else {  // single-component scan (grayscale)
        JpegComp* c = &st->comp[st->scan_comp_idx[0]];
        int bw = (st->width * c->h / st->hmax + 7) / 8;
        int bh = (st->height * c->v / st->vmax + 7) / 8;
        for (int by = 0; by < bh; ++by)
            for (int bx = 0; bx < bw; ++bx) {
                if (!handle_restart()) return -22;
                int16_t* out = outs[st->scan_comp_idx[0]] +
                               ((int64_t)by * c->bw + bx) * 64;
                if (!jpeg_decode_block(br, st, c, out)) return -22;
                mcus_done++;
            }
    }
    return 0;
}

}  // namespace

// info layout (int32): [0]=width [1]=height [2]=ncomp [3]=restart_interval,
// then per component i<4: [4+5i]=Hi [5+5i]=Vi [6+5i]=qtab_id [7+5i]=bw
// [8+5i]=bh. qtabs: 4 tables x 64 int32, natural order.
int bff_jpeg_info(const uint8_t* blob, int64_t size, int32_t* info,
                  int32_t* qtabs) {
    JpegState st;
    int rc = jpeg_parse(blob, size, &st);
    if (rc != 0) return rc;
    info[0] = st.width;
    info[1] = st.height;
    info[2] = st.ncomp;
    info[3] = st.restart_interval;
    for (int i = 0; i < 4; ++i) {
        info[4 + 5 * i] = i < st.ncomp ? st.comp[i].h : 0;
        info[5 + 5 * i] = i < st.ncomp ? st.comp[i].v : 0;
        info[6 + 5 * i] = i < st.ncomp ? st.comp[i].tq : 0;
        info[7 + 5 * i] = i < st.ncomp ? st.comp[i].bw : 0;
        info[8 + 5 * i] = i < st.ncomp ? st.comp[i].bh : 0;
        for (int j = 0; j < 64; ++j) qtabs[i * 64 + j] = st.qtab[i][j];
    }
    return 0;
}

// outs: ncomp caller-allocated int16 buffers sized bh_i*bw_i*64 and
// ZERO-INITIALIZED (the decoder writes only nonzero/DC entries).
int bff_jpeg_coeffs(const uint8_t* blob, int64_t size, int16_t* out0,
                    int16_t* out1, int16_t* out2, int16_t* out3) {
    JpegState st;
    int rc = jpeg_parse(blob, size, &st);
    if (rc != 0) return rc;
    int16_t* outs[4] = {out0, out1, out2, out3};
    for (int i = 0; i < st.scan_ncomp; ++i)
        if (outs[st.scan_comp_idx[i]] == nullptr) return -23;
    return jpeg_decode_coeffs(&st, blob + size, outs);
}

// Single-pass JXT wire scan over the concatenated dense coefficient tensor
// (core/jxt.py pack() semantics): emits the delta stream (position
// differences, gaps > 255 bridged with zero-valued delta-255 skip entries)
// and the int8 value stream with -128 escaping to the int16 side channel,
// in one cache-friendly pass — replaces a numpy flatnonzero + gather +
// cumsum chain that measured ~13 ms/frame on the 1-core host (the
// miss-regime bottleneck of the coefficient transport). delta/val must
// hold n + n/255 + 8 entries, esc n int16. Returns the total entry count;
// *n_nonzero / *n_esc receive the nonzero and escape counts.
int64_t bff_jxt_scan(const int16_t* flat, int64_t n, uint8_t* delta,
                     int8_t* val, int16_t* esc, int64_t* n_nonzero,
                     int64_t* n_esc) {
    int64_t m = 0, e = 0, nz = 0, last = 0;
    for (int64_t i = 0; i < n; ++i) {
        int16_t v = flat[i];
        if (v == 0) continue;
        int64_t d = i - last;
        last = i;
        int64_t ns = d > 0 ? (d - 1) / 255 : 0;
        for (int64_t k = 0; k < ns; ++k) {
            delta[m] = 255;
            val[m] = 0;
            ++m;
        }
        delta[m] = (uint8_t)(d - 255 * ns);
        if (v > 127 || v < -127) {
            val[m] = -128;
            esc[e++] = v;
        } else {
            val[m] = (int8_t)v;
        }
        ++m;
        ++nz;
    }
    *n_nonzero = nz;
    *n_esc = e;
    return m;
}

// Depth-pack: lossless block transport for uint16 depth maps (the
// projection stage's host->device feed wall; see core/depth_pack.py for the
// device-side decode). The flattened frame is split into 64-pixel blocks;
// each block stores its first pixel as a uint16 base plus ZIGZAG-coded
// NEIGHBOR deltas at a per-block width class k in {0,4,8,16} bits in one
// contiguous stream — neighbor deltas track the surface GRADIENT (a few
// to a few tens of mm/px on indoor surfaces at any absolute depth), where
// a min-based window would blow up on steep smooth gradients. Deltas that
// do not fit the class (depth discontinuities, invalid-zero speckle)
// store 0 and escape the TRUE delta to a (flat position, int32
// correction) side channel; the device adds corrections into the delta
// field before the per-block prefix sum, so the chain stays exact. Per
// block the class minimizes wire bytes: payload(k) + 8 * escapes(k).
// Smooth content packs at ~0.3-1 B/px; noise degrades to k=16 and the
// Python caller's spill guard falls back to the raw transport.
//
// n_px must be a multiple of 64 (caller edge-pads). classes/bases get
// n_px/64 entries; stream worst case 2*n_px bytes; esc_pos/esc_corr worst
// case n_px entries. Returns 0; *stream_len and *n_esc receive sizes.
int bff_depth_pack(const uint16_t* depth, int64_t n_px, uint8_t* classes,
                   int8_t* preds, uint16_t* bases, uint8_t* stream,
                   int64_t* stream_len, int32_t* esc_pos, int32_t* esc_corr,
                   int64_t* n_esc) {
    if (n_px % 64) return -1;
    const int64_t n_blocks = n_px / 64;
    static const int ks[5] = {0, 2, 4, 8, 16};
    static const uint32_t lims[5] = {1u, 4u, 16u, 256u, 65536u};
    int64_t sp = 0, ep = 0;
    int32_t d[64];
    uint32_t z[64];
    int32_t ds[63];
    for (int64_t b = 0; b < n_blocks; ++b) {
        const uint16_t* px = depth + b * 64;
        d[0] = 0;
        for (int i = 1; i < 64; ++i) {
            d[i] = (int32_t)px[i] - (int32_t)px[i - 1];
            ds[i - 1] = d[i];
        }
        // per-block slope predictor: the median neighbor delta centers the
        // residuals of a constant-gradient surface at 0 (one class lower)
        std::nth_element(ds, ds + 31, ds + 63);
        int32_t p = ds[31];
        if (p < -127) p = -127;
        if (p > 127) p = 127;
        // pixel 0 stays out of the predicted chain (stored z=0, decoded
        // delta 0): zigzag(-p) would otherwise force an escape in narrow
        // classes whenever the slope is nonzero
        z[0] = 0;
        int cnt[5] = {0, 0, 0, 0, 0};  // escapes per class
        for (int i = 1; i < 64; ++i) {
            const int32_t r = d[i] - p;
            const uint32_t zz = r >= 0 ? (uint32_t)(2 * r) : (uint32_t)(-2 * r - 1);
            z[i] = zz;
            for (int c = 0; c < 5; ++c) cnt[c] += zz >= lims[c];
        }
        int best_c = 0;
        int best_cost = 8 * cnt[0];
        for (int c = 1; c < 5; ++c) {
            const int cost = ks[c] * 8 + 8 * cnt[c];
            if (cost < best_cost) { best_cost = cost; best_c = c; }
        }
        const int k = ks[best_c];
        const uint32_t lim = lims[best_c];
        classes[b] = (uint8_t)best_c;
        preds[b] = (int8_t)p;
        bases[b] = px[0];
        for (int i = 0; i < 64; ++i) {
            uint32_t zz = z[i];
            if (zz >= lim) {
                esc_pos[ep] = (int32_t)(b * 64 + i);
                esc_corr[ep] = d[i] - p;
                ++ep;
                zz = 0;
            }
            if (k == 2) {
                if (i % 4 == 0) stream[sp] = (uint8_t)zz;
                else {
                    stream[sp] |= (uint8_t)(zz << (2 * (i % 4)));
                    if (i % 4 == 3) ++sp;
                }
            } else if (k == 4) {
                if (i % 2 == 0) stream[sp] = (uint8_t)zz;
                else stream[sp++] |= (uint8_t)(zz << 4);
            } else if (k == 8) {
                stream[sp++] = (uint8_t)zz;
            } else if (k == 16) {
                stream[sp++] = (uint8_t)(zz & 0xff);
                stream[sp++] = (uint8_t)(zz >> 8);
            }
        }
    }
    *stream_len = sp;
    *n_esc = ep;
    return 0;
}

}  // extern "C"
