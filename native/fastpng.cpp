// fastpng — minimal, dependency-light PNG decoder for the data loader.
//
// The reference feeds training with pyspng (a C libspng binding) because
// Python-side PNG decode bottlenecks high-resolution GAN training
// (gmpi/datasets.py:109-111).  This is the TPU framework's native analogue:
// a small C++ decoder (zlib inflate + PNG unfiltering) exposed through a C
// ABI and loaded via ctypes — no pybind11 required.
//
// Supports the subset the datasets need: 8-bit RGB / RGBA / grayscale,
// non-interlaced (FFHQ/AFHQ/MetFaces releases are all of this form).
// Returns 0 on success; negative error codes otherwise.
//
// Build: g++ -O3 -shared -fPIC fastpng.cpp -lz -o libfastpng.so

#include <cstdint>
#include <cstring>
#include <vector>
#include <zlib.h>

namespace {

uint32_t be32(const uint8_t* p) {
    return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) | (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
    int p = a + b - c;
    int pa = p > a ? p - a : a - p;
    int pb = p > b ? p - b : b - p;
    int pc = p > c ? p - c : c - p;
    if (pa <= pb && pa <= pc) return a;
    if (pb <= pc) return b;
    return c;
}

}  // namespace

extern "C" {

// Parse header only: fills width/height/channels. Returns 0 on success.
int fastpng_info(const uint8_t* data, int64_t size, int32_t* width, int32_t* height,
                 int32_t* channels) {
    static const uint8_t magic[8] = {0x89, 'P', 'N', 'G', '\r', '\n', 0x1a, '\n'};
    if (size < 33 || memcmp(data, magic, 8) != 0) return -1;
    const uint8_t* ihdr = data + 8;
    if (be32(ihdr) < 13 || memcmp(ihdr + 4, "IHDR", 4) != 0) return -2;
    *width = (int32_t)be32(ihdr + 8);
    *height = (int32_t)be32(ihdr + 12);
    int bit_depth = ihdr[16];
    int color_type = ihdr[17];
    int interlace = ihdr[20];
    if (bit_depth != 8 || interlace != 0) return -3;
    switch (color_type) {
        case 0: *channels = 1; break;  // gray
        case 2: *channels = 3; break;  // rgb
        case 4: *channels = 2; break;  // gray+alpha
        case 6: *channels = 4; break;  // rgba
        default: return -4;            // palette unsupported
    }
    return 0;
}

// Decode into caller-allocated out (height*width*channels bytes).
int fastpng_decode(const uint8_t* data, int64_t size, uint8_t* out, int32_t out_size) {
    int32_t w, h, c;
    int rc = fastpng_info(data, size, &w, &h, &c);
    if (rc != 0) return rc;
    if ((int64_t)out_size < (int64_t)w * h * c) return -5;

    // gather IDAT payload
    std::vector<uint8_t> idat;
    const uint8_t* p = data + 8;
    const uint8_t* end = data + size;
    while (p + 12 <= end) {
        uint32_t len = be32(p);
        if (p + 12 + len > end) return -6;
        if (memcmp(p + 4, "IDAT", 4) == 0) idat.insert(idat.end(), p + 8, p + 8 + len);
        if (memcmp(p + 4, "IEND", 4) == 0) break;
        p += 12 + len;
    }
    if (idat.empty()) return -7;

    const int64_t stride = (int64_t)w * c;
    std::vector<uint8_t> raw((stride + 1) * h);
    uLongf raw_len = (uLongf)raw.size();
    if (uncompress(raw.data(), &raw_len, idat.data(), (uLong)idat.size()) != Z_OK) return -8;
    if ((int64_t)raw_len != (int64_t)raw.size()) return -9;

    // unfilter scanlines
    std::vector<uint8_t> prev(stride, 0);
    for (int64_t y = 0; y < h; y++) {
        const uint8_t* src = raw.data() + y * (stride + 1);
        uint8_t filter = src[0];
        const uint8_t* line = src + 1;
        uint8_t* dst = out + y * stride;
        switch (filter) {
            case 0:
                memcpy(dst, line, stride);
                break;
            case 1:  // sub
                for (int64_t x = 0; x < stride; x++)
                    dst[x] = line[x] + (x >= c ? dst[x - c] : 0);
                break;
            case 2:  // up
                for (int64_t x = 0; x < stride; x++) dst[x] = line[x] + prev[x];
                break;
            case 3:  // average
                for (int64_t x = 0; x < stride; x++) {
                    int a = x >= c ? dst[x - c] : 0;
                    dst[x] = line[x] + (uint8_t)((a + prev[x]) / 2);
                }
                break;
            case 4:  // paeth
                for (int64_t x = 0; x < stride; x++) {
                    int a = x >= c ? dst[x - c] : 0;
                    int b = prev[x];
                    int cc = x >= c ? prev[x - c] : 0;
                    dst[x] = line[x] + (uint8_t)paeth(a, b, cc);
                }
                break;
            default:
                return -10;
        }
        memcpy(prev.data(), dst, stride);
    }
    return 0;
}

// Box-filter downscale by an integer factor (the LANCZOS quality path stays
// in PIL; integer box reduction covers the common 1024->256/512 training
// resizes with antialiasing).
int fastpng_box_downscale(const uint8_t* src, int32_t h, int32_t w, int32_t c,
                          int32_t factor, uint8_t* out) {
    if (factor <= 0 || h % factor || w % factor) return -1;
    int32_t oh = h / factor, ow = w / factor;
    int32_t area = factor * factor;
    for (int32_t y = 0; y < oh; y++) {
        for (int32_t x = 0; x < ow; x++) {
            for (int32_t ch = 0; ch < c; ch++) {
                uint32_t acc = 0;
                for (int32_t dy = 0; dy < factor; dy++) {
                    const uint8_t* row = src + ((int64_t)(y * factor + dy) * w + x * factor) * c + ch;
                    for (int32_t dx = 0; dx < factor; dx++) acc += row[(int64_t)dx * c];
                }
                out[((int64_t)y * ow + x) * c + ch] = (uint8_t)((acc + area / 2) / area);
            }
        }
    }
    return 0;
}

}  // extern "C"
