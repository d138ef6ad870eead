// Native host-side data runtime: .npy feature reading, WAV decoding, and
// static-shape batch assembly for the training pipeline.
//
// Role: the hot host path of the data loader (the reference relies on
// torch's C++ DataLoader/collate machinery with num_workers=0; here the
// equivalent batch-assembly work is done natively and handed to JAX as
// ready-made contiguous buffers). Exposed through a plain C ABI consumed
// via ctypes (no pybind11 in the image).
//
// Supported .npy subset: v1.x/2.x little-endian '<f4' and '<i4', C-order,
// 1-D or 2-D — exactly what the feature cache writes.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <thread>

extern "C" {

// ---------------------------------------------------------------------------
// .npy reading
// ---------------------------------------------------------------------------

// Parses an .npy header. Returns 0 on success; fills dtype ('f' or 'i'),
// ndim, shape[2], and the byte offset of the payload.
static int parse_npy_header(FILE* f, char* dtype, int* ndim, int64_t shape[2],
                            long* payload_off) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return -1;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return -2;
  int major = magic[6];
  uint32_t header_len = 0;
  if (major == 1) {
    unsigned char l[2];
    if (fread(l, 1, 2, f) != 2) return -3;
    header_len = l[0] | (l[1] << 8);
  } else {
    unsigned char l[4];
    if (fread(l, 1, 4, f) != 4) return -3;
    header_len = l[0] | (l[1] << 8) | (l[2] << 16) | ((uint32_t)l[3] << 24);
  }
  std::string header(header_len, '\0');
  if (fread(&header[0], 1, header_len, f) != header_len) return -4;
  *payload_off = ftell(f);

  if (header.find("'<f4'") != std::string::npos)
    *dtype = 'f';
  else if (header.find("'<i4'") != std::string::npos)
    *dtype = 'i';
  else
    return -5;
  if (header.find("'fortran_order': True") != std::string::npos) return -6;

  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) return -7;
  size_t open = header.find('(', sp);
  size_t close = header.find(')', open);
  std::string dims = header.substr(open + 1, close - open - 1);
  shape[0] = shape[1] = 1;
  *ndim = 0;
  const char* p = dims.c_str();
  while (*p && *ndim < 2) {
    while (*p == ' ' || *p == ',') ++p;
    if (!*p) break;
    shape[(*ndim)++] = strtoll(p, (char**)&p, 10);
  }
  return 0;
}

// Reads an .npy file's shape without loading data. Returns 0 on success.
int npy_shape(const char* path, int64_t* rows, int64_t* cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char dtype;
  int ndim;
  int64_t shape[2];
  long off;
  int rc = parse_npy_header(f, &dtype, &ndim, shape, &off);
  fclose(f);
  if (rc) return rc;
  *rows = shape[0];
  *cols = ndim == 2 ? shape[1] : 1;
  return 0;
}

// Reads up to max_rows x max_cols of an .npy into out (float32, C-order,
// caller-allocated, assumed zeroed). Returns rows actually read, < 0 on error.
int64_t npy_read_f32(const char* path, float* out, int64_t max_rows,
                     int64_t max_cols) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  char dtype;
  int ndim;
  int64_t shape[2];
  long off;
  int rc = parse_npy_header(f, &dtype, &ndim, shape, &off);
  if (rc) {
    fclose(f);
    return rc;
  }
  int64_t rows = shape[0] < max_rows ? shape[0] : max_rows;
  int64_t cols = (ndim == 2 ? shape[1] : 1);
  int64_t keep_cols = cols < max_cols ? cols : max_cols;
  fseek(f, off, SEEK_SET);
  if (dtype == 'f') {
    if (cols == keep_cols && keep_cols == max_cols) {
      // contiguous fast path
      if ((int64_t)fread(out, sizeof(float), rows * cols, f) != rows * cols) {
        fclose(f);
        return -8;
      }
    } else {
      std::vector<float> rowbuf(cols);
      for (int64_t r = 0; r < rows; ++r) {
        if ((int64_t)fread(rowbuf.data(), sizeof(float), cols, f) != cols) {
          fclose(f);
          return -8;
        }
        memcpy(out + r * max_cols, rowbuf.data(), keep_cols * sizeof(float));
      }
    }
  } else {  // int -> float convert
    std::vector<int32_t> rowbuf(cols);
    for (int64_t r = 0; r < rows; ++r) {
      if ((int64_t)fread(rowbuf.data(), sizeof(int32_t), cols, f) != cols) {
        fclose(f);
        return -8;
      }
      for (int64_t c = 0; c < keep_cols; ++c)
        out[r * max_cols + c] = (float)rowbuf[c];
    }
  }
  fclose(f);
  return rows;
}

// ---------------------------------------------------------------------------
// WAV (16-bit PCM) reading
// ---------------------------------------------------------------------------

// Decodes a 16-bit PCM mono/stereo WAV to float32 in [-1, 1] (stereo is
// averaged). Returns sample count, < 0 on error. out may be null to query.
int64_t wav_read_f32(const char* path, float* out, int64_t max_samples,
                     int32_t* sample_rate) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  unsigned char hdr[12];
  if (fread(hdr, 1, 12, f) != 12 || memcmp(hdr, "RIFF", 4) ||
      memcmp(hdr + 8, "WAVE", 4)) {
    fclose(f);
    return -2;
  }
  uint16_t channels = 1, bits = 16;
  uint32_t rate = 0;
  int64_t n = -1;
  // chunk walk
  unsigned char ch[8];
  while (fread(ch, 1, 8, f) == 8) {
    uint32_t size = ch[4] | (ch[5] << 8) | (ch[6] << 16) | ((uint32_t)ch[7] << 24);
    if (!memcmp(ch, "fmt ", 4)) {
      unsigned char fmt[16];
      if (fread(fmt, 1, 16, f) != 16) {
        fclose(f);
        return -3;
      }
      channels = fmt[2] | (fmt[3] << 8);
      rate = fmt[4] | (fmt[5] << 8) | (fmt[6] << 16) | ((uint32_t)fmt[7] << 24);
      bits = fmt[14] | (fmt[15] << 8);
      if (size > 16) fseek(f, size - 16, SEEK_CUR);
    } else if (!memcmp(ch, "data", 4)) {
      if (bits != 16 || channels == 0) {
        fclose(f);
        return -4;
      }
      int64_t frames = size / (2 * channels);
      n = frames;
      if (out) {
        int64_t keep = frames < max_samples ? frames : max_samples;
        std::vector<int16_t> buf(keep * channels);
        if ((int64_t)fread(buf.data(), 2, keep * channels, f) !=
            keep * channels) {
          fclose(f);
          return -5;
        }
        for (int64_t i = 0; i < keep; ++i) {
          float acc = 0.f;
          for (int c = 0; c < channels; ++c) acc += buf[i * channels + c];
          out[i] = acc / (channels * 32768.0f);
        }
        n = keep;
      }
      break;
    } else {
      fseek(f, size, SEEK_CUR);
    }
  }
  fclose(f);
  if (sample_rate) *sample_rate = (int32_t)rate;
  return n;
}

// ---------------------------------------------------------------------------
// Parallel batch assembly
// ---------------------------------------------------------------------------

// Loads B feature files into a zero-padded (B, max_rows, max_cols) float32
// batch in parallel, writing each item's true row count to lengths[b].
// paths: B concatenated NUL-terminated strings. Returns 0 on success.
int collate_features(const char* paths, int64_t n_items, float* out,
                     int64_t max_rows, int64_t max_cols, int32_t* lengths) {
  std::vector<const char*> items(n_items);
  const char* p = paths;
  for (int64_t i = 0; i < n_items; ++i) {
    items[i] = p;
    p += strlen(p) + 1;
  }
  std::vector<int> errs(n_items, 0);
  int n_threads = (int)std::min<int64_t>(n_items, 8);
  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) {
    threads.emplace_back([&, t]() {
      for (int64_t i = t; i < n_items; i += n_threads) {
        int64_t rows =
            npy_read_f32(items[i], out + i * max_rows * max_cols, max_rows,
                         max_cols);
        if (rows < 0) {
          errs[i] = (int)rows;
          lengths[i] = 0;
        } else {
          lengths[i] = (int32_t)rows;
        }
      }
    });
  }
  for (auto& th : threads) th.join();
  for (int64_t i = 0; i < n_items; ++i)
    if (errs[i]) return errs[i];
  return 0;
}

}  // extern "C"
