// chunkio — native (C++) streaming chunk-archive reader of the pose3d_tpu
// host input pipeline.
//
// The reference extracts every chunk archive to disk before reading it back
// file-by-file (reference src/dataset/chunked_dataset.py:329-341:
// tar.extractall into a cache dir, then per-sample open() of
// image/depth/metadata) — every chunk pays one full write + one full read of
// the decompressed payload plus ~3N file creates. This reader instead inflates
// the archive ONCE into memory and exposes the members as (name, ptr, size)
// views over that single buffer — zero disk round-trip, zero per-member
// copies. The blobs feed straight into the batched decoders in posedec.cc.
//
// Supports plain tar and gzip tar (zlib). bz2/xz archives fall back to the
// Python tarfile streaming path (pose3d_tpu/data/chunks.py).
//
// Tar dialects handled: POSIX ustar (incl. the 155-byte prefix field), PAX
// extended headers ('x'/'g' records overriding path/size — Python's tarfile
// writes PAX_FORMAT by default since 3.8), GNU longname ('L') / longlink
// ('K'), and base-256 size encoding.
//
// C ABI (ctypes-friendly):
//   PdChunk* pd_chunk_open(const char* path)      NULL on failure
//   int64_t  pd_chunk_count(PdChunk*)             number of regular files
//   const char* pd_chunk_name(PdChunk*, int64_t)
//   const uint8_t* pd_chunk_data(PdChunk*, int64_t, int64_t* size_out)
//   void     pd_chunk_close(PdChunk*)
//   const char* pd_chunk_error()                  thread-local last error
//
// Build: make -C native  (compiled into libposedec.so, links -lz)

#include <zlib.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

thread_local std::string g_error;

struct Member {
  std::string name;
  size_t offset;
  size_t size;
};

struct PdChunkImpl {
  std::vector<uint8_t> tar;  // inflated archive; members point into it
  std::vector<Member> members;
};

bool read_file(const char *path, std::vector<uint8_t> &out) {
  FILE *f = std::fopen(path, "rb");
  if (!f) {
    g_error = std::string("cannot open ") + path;
    return false;
  }
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n < 0) {
    std::fclose(f);
    g_error = std::string("cannot stat ") + path;
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = n ? std::fread(out.data(), 1, static_cast<size_t>(n), f) : 0;
  std::fclose(f);
  if (got != static_cast<size_t>(n)) {
    g_error = std::string("short read of ") + path;
    return false;
  }
  return true;
}

// Inflate a gzip (or zlib) stream; `out` grows as needed.
bool gunzip(const std::vector<uint8_t> &in, std::vector<uint8_t> &out) {
  z_stream zs;
  std::memset(&zs, 0, sizeof(zs));
  // 15 window bits + 32: auto-detect gzip/zlib headers.
  if (inflateInit2(&zs, 15 + 32) != Z_OK) {
    g_error = "inflateInit2 failed";
    return false;
  }
  zs.next_in = const_cast<Bytef *>(in.data());
  zs.avail_in = static_cast<uInt>(in.size());
  out.clear();
  out.resize(std::max<size_t>(in.size() * 4, 1 << 20));
  size_t written = 0;
  for (;;) {
    zs.next_out = out.data() + written;
    zs.avail_out = static_cast<uInt>(out.size() - written);
    int rc = inflate(&zs, Z_NO_FLUSH);
    written = out.size() - zs.avail_out;
    if (rc == Z_STREAM_END) {
      // Multi-member gzip files concatenate streams; tar archives from
      // Python are single-stream, but handle concatenation anyway.
      if (zs.avail_in == 0) break;
      if (inflateReset2(&zs, 15 + 32) != Z_OK) break;
      continue;
    }
    if (rc != Z_OK) {
      g_error = std::string("inflate error ") + std::to_string(rc) +
                (zs.msg ? std::string(": ") + zs.msg : "");
      inflateEnd(&zs);
      return false;
    }
    if (written == out.size()) out.resize(out.size() * 2);
  }
  inflateEnd(&zs);
  out.resize(written);
  return true;
}

// Parse a tar numeric field: octal, or base-256 when the top bit of the
// first byte is set (POSIX.1-2001 extension for sizes >= 8 GiB).
int64_t tar_number(const uint8_t *p, size_t n) {
  if (n && (p[0] & 0x80)) {
    uint64_t v = p[0] & 0x7f;
    for (size_t i = 1; i < n; ++i) v = (v << 8) | p[i];
    return static_cast<int64_t>(v);
  }
  int64_t v = 0;
  for (size_t i = 0; i < n; ++i) {
    uint8_t c = p[i];
    if (c == ' ' || c == '\0') {
      if (v) break;
      continue;
    }
    if (c < '0' || c > '7') break;
    v = v * 8 + (c - '0');
  }
  return v;
}

std::string tar_string(const uint8_t *p, size_t n) {
  size_t len = 0;
  while (len < n && p[len]) ++len;
  return std::string(reinterpret_cast<const char *>(p), len);
}

// Parse PAX extended-header records ("%d key=value\n") for path/size.
void parse_pax(const uint8_t *data, size_t size, std::string *path_out,
               int64_t *size_out) {
  size_t off = 0;
  while (off < size) {
    // leading decimal record length (includes itself and the newline)
    size_t sp = off;
    while (sp < size && data[sp] != ' ') ++sp;
    if (sp >= size) return;
    long reclen = std::strtol(
        std::string(reinterpret_cast<const char *>(data + off), sp - off)
            .c_str(),
        nullptr, 10);
    if (reclen <= 0 || off + static_cast<size_t>(reclen) > size) return;
    const char *kv = reinterpret_cast<const char *>(data + sp + 1);
    size_t kvlen = off + reclen - (sp + 1);
    if (kvlen && kv[kvlen - 1] == '\n') --kvlen;
    std::string rec(kv, kvlen);
    size_t eq = rec.find('=');
    if (eq != std::string::npos) {
      std::string key = rec.substr(0, eq), val = rec.substr(eq + 1);
      if (key == "path" && path_out) *path_out = val;
      if (key == "size" && size_out) *size_out = std::strtoll(
          val.c_str(), nullptr, 10);
    }
    off += reclen;
  }
}

bool parse_tar(PdChunkImpl *c) {
  const std::vector<uint8_t> &t = c->tar;
  size_t off = 0;
  std::string pending_name;  // from PAX 'x' or GNU 'L'
  int64_t pending_size = -1;
  while (off + 512 <= t.size()) {
    const uint8_t *h = t.data() + off;
    // two zero blocks end the archive; one is enough to stop safely
    bool all_zero = true;
    for (int i = 0; i < 512; ++i)
      if (h[i]) {
        all_zero = false;
        break;
      }
    if (all_zero) break;

    std::string name = tar_string(h + 0, 100);
    int64_t size = tar_number(h + 124, 12);
    char type = static_cast<char>(h[156]);
    std::string prefix = tar_string(h + 345, 155);
    if (!prefix.empty()) name = prefix + "/" + name;

    size_t data_off = off + 512;
    size_t padded = (static_cast<size_t>(size) + 511) & ~size_t{511};
    if (size < 0 || data_off + static_cast<size_t>(size) > t.size()) {
      g_error = "truncated tar member " + name;
      return false;
    }

    if (type == 'x') {  // PAX per-file extended header
      parse_pax(t.data() + data_off, static_cast<size_t>(size),
                &pending_name, &pending_size);
    } else if (type == 'g') {  // PAX global header: ignore
    } else if (type == 'L') {  // GNU longname for the next member
      pending_name = tar_string(t.data() + data_off,
                                static_cast<size_t>(size));
    } else if (type == 'K') {  // GNU longlink: ignore
    } else if (type == '0' || type == '\0' || type == '7') {
      std::string final_name =
          pending_name.empty() ? name : pending_name;
      int64_t final_size = pending_size >= 0 ? pending_size : size;
      // PAX size overrides re-pad the data region
      size_t final_padded =
          (static_cast<size_t>(final_size) + 511) & ~size_t{511};
      if (data_off + static_cast<size_t>(final_size) > t.size()) {
        g_error = "truncated tar member " + final_name;
        return false;
      }
      c->members.push_back(
          {final_name, data_off, static_cast<size_t>(final_size)});
      pending_name.clear();
      pending_size = -1;
      off = data_off + final_padded;
      continue;
    } else {
      // directories ('5'), links, fifos, …: no payload we keep; any
      // pending PAX/longname overrides applied to them are consumed.
      pending_name.clear();
      pending_size = -1;
    }
    off = data_off + padded;
  }
  if (c->members.empty()) {
    g_error = "no file members found (not a tar archive?)";
    return false;
  }
  return true;
}

}  // namespace

extern "C" {

typedef PdChunkImpl PdChunk;

PdChunk *pd_chunk_open(const char *path) {
  g_error.clear();
  auto *c = new PdChunkImpl();
  std::vector<uint8_t> raw;
  if (!read_file(path, raw)) {
    delete c;
    return nullptr;
  }
  if (raw.size() >= 2 && raw[0] == 0x1f && raw[1] == 0x8b) {
    if (!gunzip(raw, c->tar)) {
      delete c;
      return nullptr;
    }
  } else if (raw.size() >= 265 &&
             std::memcmp(raw.data() + 257, "ustar", 5) == 0) {
    c->tar = std::move(raw);
  } else {
    g_error = std::string(path) + ": not a tar or tar.gz archive";
    delete c;
    return nullptr;
  }
  if (!parse_tar(c)) {
    delete c;
    return nullptr;
  }
  return c;
}

int64_t pd_chunk_count(PdChunk *c) {
  return static_cast<int64_t>(c->members.size());
}

const char *pd_chunk_name(PdChunk *c, int64_t i) {
  if (i < 0 || i >= static_cast<int64_t>(c->members.size())) return nullptr;
  return c->members[static_cast<size_t>(i)].name.c_str();
}

const uint8_t *pd_chunk_data(PdChunk *c, int64_t i, int64_t *size_out) {
  if (i < 0 || i >= static_cast<int64_t>(c->members.size())) {
    if (size_out) *size_out = 0;
    return nullptr;
  }
  const Member &m = c->members[static_cast<size_t>(i)];
  if (size_out) *size_out = static_cast<int64_t>(m.size);
  return c->tar.data() + m.offset;
}

void pd_chunk_close(PdChunk *c) { delete c; }

const char *pd_chunk_error() { return g_error.c_str(); }

}  // extern "C"
