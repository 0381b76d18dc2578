// octave-tpu native data loader: image decode + threaded batch assembly.
//
// The reference delegates IO to torchvision/opencv host-side (reference
// requirements.txt:2,14,16, off-tree); this is the framework's native
// equivalent: a small C++ core that decodes PNG (libpng) / BMP / raw PGM
// into caller-owned uint8 buffers and fills whole batches with a thread
// pool, so the Python host loop never touches pixel bytes.
//
// C ABI only (consumed via ctypes — no pybind11 in this image).

#include <png.h>

#include <atomic>
#include <cstdint>
#include <exception>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  std::vector<uint8_t> gray;  // row-major h*w, 8-bit grayscale
  int w = 0, h = 0;
  bool ok = false;
  std::string err;
};

// File headers are untrusted: cap dimensions before any allocation so a
// corrupt header can't trigger a multi-GB resize (bad_alloc) or overflow
// the w*h index arithmetic.
constexpr int64_t kMaxDim = 1 << 16;           // 65536 px per side
constexpr int64_t kMaxPixels = int64_t(1) << 28;  // 256 MPix (~256 MB gray)

bool sane_dims(int64_t w, int64_t h) {
  return w > 0 && h > 0 && w <= kMaxDim && h <= kMaxDim && w * h <= kMaxPixels;
}

// ---------------------------------------------------------------- PNG ----
Image decode_png(const char* path) {
  Image out;
  FILE* fp = std::fopen(path, "rb");
  if (!fp) {
    out.err = "open failed";
    return out;
  }
  png_byte header[8];
  if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    std::fclose(fp);
    out.err = "not a png";
    return out;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    out.err = "libpng alloc failed";
    return out;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    out.err = "libpng decode error";
    return out;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  out.w = static_cast<int>(png_get_image_width(png, info));
  out.h = static_cast<int>(png_get_image_height(png, info));
  if (!sane_dims(out.w, out.h)) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    out.err = "png dimensions out of range";
    out.ok = false;
    return out;
  }
  const png_byte color = png_get_color_type(png, info);
  const png_byte depth = png_get_bit_depth(png, info);

  // normalize everything to 8-bit grayscale
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (depth == 16) png_set_strip_16(png);
  if (depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color & PNG_COLOR_MASK_ALPHA) png_set_strip_alpha(png);
  if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_RGB_ALPHA ||
      color == PNG_COLOR_TYPE_PALETTE)
    png_set_rgb_to_gray_fixed(png, 1, -1, -1);
  png_read_update_info(png, info);

  out.gray.resize(static_cast<size_t>(out.w) * out.h);
  std::vector<png_bytep> rows(out.h);
  const size_t rowbytes = png_get_rowbytes(png, info);
  std::vector<uint8_t> rowbuf(rowbytes * out.h);
  for (int y = 0; y < out.h; ++y) rows[y] = rowbuf.data() + y * rowbytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);

  // rowbytes may exceed w (e.g. leftover channels); take first byte per px
  const size_t px_stride = rowbytes / out.w;
  for (int y = 0; y < out.h; ++y)
    for (int x = 0; x < out.w; ++x)
      out.gray[static_cast<size_t>(y) * out.w + x] =
          rowbuf[y * rowbytes + x * px_stride];
  out.ok = true;
  return out;
}

// ---------------------------------------------------------------- BMP ----
uint32_t rd_u32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | (uint32_t(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) { return p[0] | (p[1] << 8); }

Image decode_bmp(const char* path) {
  Image out;
  FILE* fp = std::fopen(path, "rb");
  if (!fp) {
    out.err = "open failed";
    return out;
  }
  std::fseek(fp, 0, SEEK_END);
  long size = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  std::vector<uint8_t> buf(size > 0 ? size : 0);
  if (size < 54 || std::fread(buf.data(), 1, size, fp) != (size_t)size) {
    std::fclose(fp);
    out.err = "bmp read failed";
    return out;
  }
  std::fclose(fp);
  if (buf[0] != 'B' || buf[1] != 'M') {
    out.err = "not a bmp";
    return out;
  }
  const uint32_t data_off = rd_u32(&buf[10]);
  const uint32_t hdr_size = rd_u32(&buf[14]);
  const int32_t w = static_cast<int32_t>(rd_u32(&buf[18]));
  int32_t h = static_cast<int32_t>(rd_u32(&buf[22]));
  const uint16_t bpp = rd_u16(&buf[28]);
  const uint32_t comp = rd_u32(&buf[30]);
  const bool topdown = h < 0;
  if (topdown) h = -h;
  if (comp != 0 || (bpp != 8 && bpp != 24 && bpp != 32) || hdr_size < 40) {
    out.err = "unsupported bmp variant";
    return out;
  }
  if (!sane_dims(w, h)) {
    out.err = "bmp dimensions out of range";
    return out;
  }
  // All header-derived offsets are untrusted (ADVICE r1): validate every
  // region against the file size in 64-bit math BEFORE any allocation or
  // pixel loop.
  const uint64_t fsize = static_cast<uint64_t>(size);
  const uint64_t row_stride = ((static_cast<uint64_t>(w) * bpp + 31) / 32) * 4;
  if (static_cast<uint64_t>(data_off) > fsize ||
      static_cast<uint64_t>(data_off) + row_stride * h > fsize) {
    out.err = "bmp truncated";
    return out;
  }
  // 8bpp palette: map index through the (grayscale) palette's blue channel.
  // row[x] can be any of 256 indices, so the full 256*4 palette must fit.
  if (bpp == 8 &&
      14ull + hdr_size + 256ull * 4 > fsize) {
    out.err = "bmp palette truncated";
    return out;
  }
  out.w = w;
  out.h = h;
  out.gray.resize(static_cast<size_t>(w) * h);
  const uint8_t* palette = (bpp == 8) ? &buf[14 + hdr_size] : nullptr;
  for (int32_t y = 0; y < h; ++y) {
    const int32_t src_y = topdown ? y : (h - 1 - y);
    const uint8_t* row = &buf[data_off + row_stride * src_y];
    uint8_t* dst = &out.gray[static_cast<size_t>(y) * w];
    if (bpp == 8) {
      for (int32_t x = 0; x < w; ++x) dst[x] = palette[row[x] * 4];
    } else {
      const int step = bpp / 8;
      for (int32_t x = 0; x < w; ++x) {
        const uint8_t* px = row + x * step;  // BGR
        dst[x] = static_cast<uint8_t>((299 * px[2] + 587 * px[1] + 114 * px[0]) / 1000);
      }
    }
  }
  out.ok = true;
  return out;
}

// ---------------------------------------------------------------- PGM ----
Image decode_pgm(const char* path) {
  Image out;
  FILE* fp = std::fopen(path, "rb");
  if (!fp) {
    out.err = "open failed";
    return out;
  }
  int w = 0, h = 0, maxv = 0;
  if (std::fscanf(fp, "P5 %d %d %d", &w, &h, &maxv) != 3 || maxv > 255 ||
      !sane_dims(w, h)) {
    std::fclose(fp);
    out.err = "unsupported pgm";
    return out;
  }
  std::fgetc(fp);  // single whitespace after maxval
  out.w = w;
  out.h = h;
  out.gray.resize(static_cast<size_t>(w) * h);
  const bool ok = std::fread(out.gray.data(), 1, out.gray.size(), fp) == out.gray.size();
  std::fclose(fp);
  out.ok = ok;
  if (!ok) out.err = "pgm truncated";
  return out;
}

Image decode_any_impl(const char* path) {
  const std::string p(path);
  auto ends = [&](const char* s) {
    const size_t n = std::strlen(s);
    return p.size() >= n &&
           strcasecmp(p.c_str() + p.size() - n, s) == 0;
  };
  if (ends(".png")) return decode_png(path);
  if (ends(".bmp")) return decode_bmp(path);
  if (ends(".pgm")) return decode_pgm(path);
  // sniff
  FILE* fp = std::fopen(path, "rb");
  if (!fp) {
    Image out;
    out.err = "open failed";
    return out;
  }
  uint8_t magic[2] = {0, 0};
  size_t got = std::fread(magic, 1, 2, fp);
  std::fclose(fp);
  if (got == 2 && magic[0] == 0x89 && magic[1] == 'P') return decode_png(path);
  if (got == 2 && magic[0] == 'B' && magic[1] == 'M') return decode_bmp(path);
  if (got == 2 && magic[0] == 'P' && magic[1] == '5') return decode_pgm(path);
  Image out;
  out.err = "unknown image format";
  return out;
}

// A malformed file must count as a decode failure, never an uncaught
// exception: exceptions would cross the extern "C" / ctypes boundary (UB)
// or escape a pool thread (std::terminate). (ADVICE r1)
Image decode_any(const char* path) {
  try {
    return decode_any_impl(path);
  } catch (const std::exception& e) {
    Image out;
    out.err = std::string("decode exception: ") + e.what();
    return out;
  } catch (...) {
    Image out;
    out.err = "decode exception";
    return out;
  }
}

}  // namespace

extern "C" {

// Probe an image's dimensions. Returns 0 on success.
int octave_image_size(const char* path, int* w, int* h) {
  Image im = decode_any(path);
  if (!im.ok) return -1;
  *w = im.w;
  *h = im.h;
  return 0;
}

// Decode into a caller-allocated h*w uint8 buffer (exact size required).
int octave_decode_image(const char* path, uint8_t* out, int w, int h) {
  Image im = decode_any(path);
  if (!im.ok || im.w != w || im.h != h) return -1;
  std::memcpy(out, im.gray.data(), static_cast<size_t>(w) * h);
  return 0;
}

// Decode n images (newline-joined paths) into out[n*h*w] with a thread
// pool, nearest-resizing each to (h, w) if needed. Returns the number of
// failures (0 == all good).
int octave_load_batch(const char* joined_paths, int n, uint8_t* out, int w,
                      int h, int n_threads) {
  std::vector<std::string> paths;
  {
    const char* s = joined_paths;
    for (int i = 0; i < n; ++i) {
      const char* e = std::strchr(s, '\n');
      if (!e) e = s + std::strlen(s);
      paths.emplace_back(s, e - s);
      s = (*e) ? e + 1 : e;
    }
  }
  std::atomic<int> next(0), failures(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      Image im = decode_any(paths[i].c_str());
      uint8_t* dst = out + static_cast<size_t>(i) * w * h;
      if (!im.ok) {
        failures.fetch_add(1);
        std::memset(dst, 0, static_cast<size_t>(w) * h);
        continue;
      }
      if (im.w == w && im.h == h) {
        std::memcpy(dst, im.gray.data(), static_cast<size_t>(w) * h);
      } else {
        // nearest resize (torch convention: src = floor(dst * in / out))
        for (int y = 0; y < h; ++y) {
          const int sy = static_cast<int>(static_cast<int64_t>(y) * im.h / h);
          for (int x = 0; x < w; ++x) {
            const int sx = static_cast<int>(static_cast<int64_t>(x) * im.w / w);
            dst[y * w + x] = im.gray[static_cast<size_t>(sy) * im.w + sx];
          }
        }
      }
    }
  };
  if (n_threads < 1) n_threads = 1;
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
