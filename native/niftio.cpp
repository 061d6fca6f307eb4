// niftio — native NIfTI-1 reader for the depgan_tpu data layer.
//
// The reference delegates NIfTI I/O to nibabel (load_data,
// DEP-GAN_testing_4fold.py:73-83). depgan_tpu ships its own reader; this
// C++ implementation is the fast path behind data/nifti.py (ctypes), with
// the pure-numpy reader as fallback. It does, in one pass per file:
//   gzip (zlib) or raw read -> header parse -> dtype conversion to float32
//   -> scl_slope/inter application
// and provides a std::thread fan-out for loading many volumes at once
// (subject = 9+ modality files; the Python GIL serialises small-file
// decompression otherwise).
//
// C ABI (see data/native.py):
//   int  niftio_read_header(path, NiftioHeader* out)
//   long niftio_read_f32(path, float* out, long capacity, NiftioHeader* out)
//   int  niftio_read_many_f32(paths, n, buffers, capacities, headers, n_threads)
// All functions return 0 / element-count on success, negative error codes
// otherwise.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

extern "C" {

struct NiftioHeader {
  int32_t ndim;
  int32_t dims[7];
  int32_t datatype;
  float pixdim[7];
  float vox_offset;
  float scl_slope;
  float scl_inter;
  float srow[12];  // sform rows x, y, z
  int32_t sform_code;
  int32_t qform_code;
};

enum {
  NIFTIO_OK = 0,
  NIFTIO_ERR_OPEN = -1,
  NIFTIO_ERR_HEADER = -2,
  NIFTIO_ERR_DTYPE = -3,
  NIFTIO_ERR_CAPACITY = -4,
  NIFTIO_ERR_TRUNCATED = -5,
};

}  // extern "C" (reopened below for the API functions)

namespace {

// Read a whole file, transparently gunzipping (.nii.gz or any gzip magic).
bool read_all(const char* path, std::vector<uint8_t>& out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  uint8_t magic[2] = {0, 0};
  size_t got = fread(magic, 1, 2, f);
  fclose(f);
  if (got != 2) return false;

  if (magic[0] == 0x1f && magic[1] == 0x8b) {
    gzFile gz = gzopen(path, "rb");
    if (!gz) return false;
    gzbuffer(gz, 1 << 20);
    out.clear();
    uint8_t buf[1 << 20];
    int n;
    while ((n = gzread(gz, buf, sizeof buf)) > 0) {
      out.insert(out.end(), buf, buf + n);
    }
    bool ok = (n == 0);
    gzclose(gz);
    return ok;
  }

  f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  out.resize(size);
  bool ok = fread(out.data(), 1, size, f) == static_cast<size_t>(size);
  fclose(f);
  return ok;
}

template <typename T>
void convert(const uint8_t* src, float* dst, int64_t n, float slope, float inter) {
  const T* s = reinterpret_cast<const T*>(src);
  if (slope == 1.0f && inter == 0.0f) {
    for (int64_t i = 0; i < n; ++i) dst[i] = static_cast<float>(s[i]);
  } else {
    for (int64_t i = 0; i < n; ++i)
      dst[i] = static_cast<float>(s[i]) * slope + inter;
  }
}

int parse_header(const std::vector<uint8_t>& raw, NiftioHeader* h) {
  if (raw.size() < 348) return NIFTIO_ERR_HEADER;
  int32_t sizeof_hdr;
  memcpy(&sizeof_hdr, raw.data(), 4);
  if (sizeof_hdr != 348) return NIFTIO_ERR_HEADER;  // big-endian unsupported here

  int16_t dim[8];
  memcpy(dim, raw.data() + 40, 16);
  h->ndim = dim[0];
  for (int i = 0; i < 7; ++i) h->dims[i] = (i < dim[0]) ? dim[i + 1] : 1;

  int16_t datatype;
  memcpy(&datatype, raw.data() + 70, 2);
  h->datatype = datatype;

  float pixdim[8];
  memcpy(pixdim, raw.data() + 76, 32);
  for (int i = 0; i < 7; ++i) h->pixdim[i] = pixdim[i + 1];

  memcpy(&h->vox_offset, raw.data() + 108, 4);
  memcpy(&h->scl_slope, raw.data() + 112, 4);
  memcpy(&h->scl_inter, raw.data() + 116, 4);
  int16_t qc, sc;
  memcpy(&qc, raw.data() + 252, 2);
  memcpy(&sc, raw.data() + 254, 2);
  h->qform_code = qc;
  h->sform_code = sc;
  memcpy(h->srow, raw.data() + 280, 48);
  return NIFTIO_OK;
}

int64_t element_count(const NiftioHeader& h) {
  int64_t n = 1;
  for (int i = 0; i < h.ndim && i < 7; ++i) n *= h.dims[i];
  return n;
}

int read_volume(const char* path, float* out, int64_t capacity, NiftioHeader* h) {
  std::vector<uint8_t> raw;
  if (!read_all(path, raw)) return NIFTIO_ERR_OPEN;
  int rc = parse_header(raw, h);
  if (rc != NIFTIO_OK) return rc;

  int64_t n = element_count(*h);
  if (out == nullptr) return NIFTIO_OK;  // header-only
  if (n > capacity) return NIFTIO_ERR_CAPACITY;

  size_t offset = static_cast<size_t>(h->vox_offset);
  float slope = (h->scl_slope == 0.0f) ? 1.0f : h->scl_slope;
  float inter = h->scl_inter;
  // scl of exactly (1, 0) means "no scaling"; keep raw values bit-exact.
  if (h->scl_slope == 0.0f || (h->scl_slope == 1.0f && inter == 0.0f)) {
    slope = 1.0f;
    inter = 0.0f;
  }

  const uint8_t* src = raw.data() + offset;
  size_t avail = raw.size() - offset;

  switch (h->datatype) {
    case 2:  // uint8
      if (avail < (size_t)n) return NIFTIO_ERR_TRUNCATED;
      convert<uint8_t>(src, out, n, slope, inter);
      break;
    case 4:  // int16
      if (avail < (size_t)n * 2) return NIFTIO_ERR_TRUNCATED;
      convert<int16_t>(src, out, n, slope, inter);
      break;
    case 8:  // int32
      if (avail < (size_t)n * 4) return NIFTIO_ERR_TRUNCATED;
      convert<int32_t>(src, out, n, slope, inter);
      break;
    case 16:  // float32
      if (avail < (size_t)n * 4) return NIFTIO_ERR_TRUNCATED;
      convert<float>(src, out, n, slope, inter);
      break;
    case 64:  // float64
      if (avail < (size_t)n * 8) return NIFTIO_ERR_TRUNCATED;
      convert<double>(src, out, n, slope, inter);
      break;
    case 256:  // int8
      if (avail < (size_t)n) return NIFTIO_ERR_TRUNCATED;
      convert<int8_t>(src, out, n, slope, inter);
      break;
    case 512:  // uint16
      if (avail < (size_t)n * 2) return NIFTIO_ERR_TRUNCATED;
      convert<uint16_t>(src, out, n, slope, inter);
      break;
    case 768:  // uint32
      if (avail < (size_t)n * 4) return NIFTIO_ERR_TRUNCATED;
      convert<uint32_t>(src, out, n, slope, inter);
      break;
    default:
      return NIFTIO_ERR_DTYPE;
  }
  return NIFTIO_OK;
}

}  // namespace

extern "C" {

int niftio_read_header(const char* path, NiftioHeader* h) {
  return read_volume(path, nullptr, 0, h);
}

long niftio_read_f32(const char* path, float* out, long capacity, NiftioHeader* h) {
  int rc = read_volume(path, out, capacity, h);
  if (rc != NIFTIO_OK) return rc;
  return static_cast<long>(element_count(*h));
}

// Threaded fan-out over many files (one subject's modalities, or a fold's
// subjects). Returns 0 if all succeeded; otherwise the first error code.
int niftio_read_many_f32(const char** paths, int n, float** outs,
                         const long* capacities, NiftioHeader* headers,
                         int n_threads) {
  if (n_threads <= 0) n_threads = std::thread::hardware_concurrency();
  if (n_threads > n) n_threads = n;
  std::vector<int> results(n, NIFTIO_OK);
  std::vector<std::thread> workers;
  std::atomic<int> next{0};
  for (int t = 0; t < n_threads; ++t) {
    workers.emplace_back([&]() {
      int i;
      while ((i = next.fetch_add(1)) < n) {
        results[i] = read_volume(paths[i], outs[i], capacities[i], &headers[i]);
      }
    });
  }
  for (auto& w : workers) w.join();
  for (int i = 0; i < n; ++i)
    if (results[i] != NIFTIO_OK) return results[i];
  return NIFTIO_OK;
}

}  // extern "C"
