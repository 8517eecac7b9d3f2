// COCO-compatible RLE mask codec (column-major runs, LEB128-ish string
// compression) — native host-side mask handling for the data pipeline.
//
// Role parity: the reference relies on pycocotools' C implementation via
// lib/utils/mask_utils.py (cocosegm2mask, binary_mask_to_rle) for its
// annotation masks; this provides the same encoding from scratch with a
// plain C ABI (ctypes-friendly, no pybind11 dependency).
//
// Layout contract (COCO): masks are encoded in COLUMN-major (Fortran)
// order; runs alternate 0-run, 1-run, ... The compressed string encoding
// stores each count as a base-32 varint with char offset 48, where counts
// after the first two are deltas to the count two positions back.

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Encode a binary mask (row-major uint8 h*w) into run counts
// (column-major). Returns number of runs written (<= max_runs); if the
// buffer is too small, returns -1.
int64_t rle_encode_counts(const uint8_t* mask, int64_t h, int64_t w,
                          uint32_t* counts, int64_t max_runs) {
    int64_t n = 0;
    uint8_t prev = 0;
    uint32_t run = 0;
    for (int64_t x = 0; x < w; ++x) {
        for (int64_t y = 0; y < h; ++y) {
            uint8_t v = mask[y * w + x] ? 1 : 0;
            if (v == prev) {
                ++run;
            } else {
                if (n >= max_runs) return -1;
                counts[n++] = run;
                run = 1;
                prev = v;
            }
        }
    }
    if (n >= max_runs) return -1;
    counts[n++] = run;
    return n;
}

// Decode run counts into a row-major uint8 mask buffer (h*w).
void rle_decode_counts(const uint32_t* counts, int64_t n_runs,
                       int64_t h, int64_t w, uint8_t* mask) {
    std::memset(mask, 0, (size_t)(h * w));
    int64_t pos = 0;
    uint8_t val = 0;
    for (int64_t i = 0; i < n_runs; ++i) {
        for (uint32_t k = 0; k < counts[i] && pos < h * w; ++k, ++pos) {
            int64_t x = pos / h;
            int64_t y = pos % h;
            mask[y * w + x] = val;
        }
        val = 1 - val;
    }
}

// COCO string compression of counts. Returns bytes written, or -1 if the
// output buffer (max_len) is too small.
int64_t rle_counts_to_string(const uint32_t* counts, int64_t n_runs,
                             char* out, int64_t max_len) {
    int64_t p = 0;
    for (int64_t i = 0; i < n_runs; ++i) {
        int64_t x = (int64_t)counts[i];
        if (i > 2) x -= (int64_t)counts[i - 2];
        bool more = true;
        while (more) {
            int64_t c = x & 0x1f;
            x >>= 5;
            more = (c & 0x10) ? x != -1 : x != 0;
            if (more) c |= 0x20;
            c += 48;
            if (p >= max_len) return -1;
            out[p++] = (char)c;
        }
    }
    return p;
}

// Inverse of rle_counts_to_string. Returns number of runs, or -1 on
// overflow of max_runs.
int64_t rle_string_to_counts(const char* s, int64_t len,
                             uint32_t* counts, int64_t max_runs) {
    int64_t p = 0, n = 0;
    while (p < len) {
        int64_t x = 0;
        int64_t k = 0;
        bool more = true;
        while (more && p < len) {
            int64_t c = (int64_t)s[p] - 48;
            x |= (c & 0x1f) << (5 * k);
            more = (c & 0x20) != 0;
            ++p;
            ++k;
            if (!more && (c & 0x10)) x |= -1LL << (5 * k);
        }
        if (n > 2) x += (int64_t)counts[n - 2];
        if (n >= max_runs) return -1;
        counts[n++] = (uint32_t)x;
    }
    return n;
}

// mask area (number of 1 pixels) straight from counts
int64_t rle_area(const uint32_t* counts, int64_t n_runs) {
    int64_t a = 0;
    for (int64_t i = 1; i < n_runs; i += 2) a += counts[i];
    return a;
}

}  // extern "C"
