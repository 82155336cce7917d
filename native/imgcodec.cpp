// Native host-side image codec for the data pipeline.
//
// The training-data hot path on the host is image decode (the reference used
// tf.image.decode_jpeg's C++ kernels inside tf.data,
// /root/reference/dataloader.py:40-43).  This module provides the same
// capability natively — libjpeg(-turbo) and libpng decode to RGB u8 — plus an
// exact host-side JPEG quality round trip (encode+decode through libjpeg,
// byte-identical semantics to tf.image.adjust_jpeg_quality) as an alternative
// to the on-device DCT path in ops/jpeg.py.
//
// Exposed via ctypes (denoise_gan_tpu/data/native.py); built with:
//   g++ -O3 -shared -fPIC imgcodec.cpp -ljpeg -lpng -o libimgcodec.so

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// ---------------------------------------------------------------- JPEG decode
int decode_jpeg(const uint8_t* data, size_t len, uint8_t* out, int* h, int* w) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *h = static_cast<int>(cinfo.output_height);
  *w = static_cast<int>(cinfo.output_width);
  if (out != nullptr) {
    const int stride = cinfo.output_width * 3;
    while (cinfo.output_scanline < cinfo.output_height) {
      uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * stride;
      jpeg_read_scanlines(&cinfo, &row, 1);
    }
    jpeg_finish_decompress(&cinfo);
  }
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// ----------------------------------------------------------------- PNG decode
struct PngReadState {
  const uint8_t* data;
  size_t len;
  size_t pos;
};

void png_read_fn(png_structp png, png_bytep out, png_size_t n) {
  PngReadState* s = static_cast<PngReadState*>(png_get_io_ptr(png));
  if (s->pos + n > s->len) {
    png_error(png, "truncated");
  }
  memcpy(out, s->data + s->pos, n);
  s->pos += n;
}

int decode_png(const uint8_t* data, size_t len, uint8_t* out, int* h, int* w) {
  png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr,
                                           nullptr, nullptr);
  if (!png) return -1;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return -1;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return -1;
  }
  PngReadState state{data, len, 0};
  png_set_read_fn(png, &state, png_read_fn);
  png_read_info(png, info);

  // normalize everything to 8-bit RGB
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);

  *h = static_cast<int>(png_get_image_height(png, info));
  *w = static_cast<int>(png_get_image_width(png, info));
  if (out != nullptr) {
    const size_t stride = static_cast<size_t>(*w) * 3;
    std::vector<png_bytep> rows(*h);
    for (int y = 0; y < *h; ++y) rows[y] = out + y * stride;
    png_read_image(png, rows.data());
  }
  png_destroy_read_struct(&png, &info, nullptr);
  return 0;
}

}  // namespace

extern "C" {

// Decode JPEG/PNG (sniffed from magic bytes) to RGB u8.
// Pass out=nullptr to probe dimensions only.  Returns 0 on success.
int dg_decode(const uint8_t* data, size_t len, uint8_t* out, int* h, int* w) {
  if (len >= 3 && data[0] == 0xFF && data[1] == 0xD8 && data[2] == 0xFF) {
    return decode_jpeg(data, len, out, h, w);
  }
  if (len >= 8 && png_sig_cmp(const_cast<png_bytep>(data), 0, 8) == 0) {
    return decode_png(data, len, out, h, w);
  }
  return -2;  // unknown format
}

// Exact JPEG quality round trip (libjpeg encode at `quality`, 4:2:0 default
// chroma like tf.image.adjust_jpeg_quality, then decode) on an RGB u8 image.
// out must hold h*w*3 bytes.  Returns 0 on success.
int dg_jpeg_roundtrip(const uint8_t* rgb, int h, int w, int quality,
                      uint8_t* out) {
  // encode to memory
  jpeg_compress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  unsigned char* buf = nullptr;
  unsigned long buflen = 0;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_compress(&cinfo);
    free(buf);
    return -1;
  }
  jpeg_create_compress(&cinfo);
  jpeg_mem_dest(&cinfo, &buf, &buflen);
  cinfo.image_width = w;
  cinfo.image_height = h;
  cinfo.input_components = 3;
  cinfo.in_color_space = JCS_RGB;
  jpeg_set_defaults(&cinfo);
  jpeg_set_quality(&cinfo, quality, TRUE);
  jpeg_start_compress(&cinfo, TRUE);
  const int stride = w * 3;
  while (cinfo.next_scanline < cinfo.image_height) {
    JSAMPROW row = const_cast<JSAMPROW>(
        rgb + static_cast<size_t>(cinfo.next_scanline) * stride);
    jpeg_write_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_compress(&cinfo);
  jpeg_destroy_compress(&cinfo);

  int dh = 0, dw = 0;
  int rc = decode_jpeg(buf, buflen, out, &dh, &dw);
  free(buf);
  if (rc != 0 || dh != h || dw != w) return -1;
  return 0;
}

}  // extern "C"
