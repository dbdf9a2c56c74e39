// bankio: native NPZ/NPY reader for bank artifacts.
//
// The reference loads its ~0.5 GB retrieval database with np.load on an npz
// (range/range.py:78), which streams each member through Python's zipfile.
// This library mmaps the archive, parses the zip central directory + npy
// headers directly, serves STORED members as zero-copy pointers and DEFLATE
// members through zlib, and releases the GIL for the copy (the Python side
// reads the three bank members on three threads).
//
// C ABI only (ctypes-friendly; no pybind11 in the image).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>
#include <zlib.h>

namespace {

struct Member {
  std::string name;        // zip member name (e.g. "locs.npy")
  uint16_t method = 0;     // 0 stored, 8 deflate
  uint64_t comp_size = 0;
  uint64_t uncomp_size = 0;
  uint64_t header_offset = 0;  // local file header offset
  // npy metadata (parsed lazily)
  std::string descr;
  std::vector<int64_t> shape;
  uint64_t data_offset = 0;  // offset of raw array data within the archive
                             // (stored members only)
  uint64_t npy_header_len = 0;
  bool parsed = false;
};

struct Archive {
  int fd = -1;
  const uint8_t* base = nullptr;
  size_t size = 0;
  std::vector<Member> members;
  std::string error;
};

uint16_t rd16(const uint8_t* p) { return p[0] | (p[1] << 8); }
uint32_t rd32(const uint8_t* p) {
  return p[0] | (p[1] << 8) | (p[2] << 16) | ((uint32_t)p[3] << 24);
}
uint64_t rd64(const uint8_t* p) {
  uint64_t v = 0;
  for (int i = 7; i >= 0; --i) v = (v << 8) | p[i];
  return v;
}

// Find EOCD (optionally zip64) and walk the central directory.
bool parse_central_directory(Archive* a) {
  const uint8_t* b = a->base;
  size_t n = a->size;
  if (n < 22) return false;
  // scan backwards for EOCD signature 0x06054b50
  size_t scan_limit = n > (65536 + 22) ? n - 65536 - 22 : 0;
  size_t eocd = SIZE_MAX;
  for (size_t i = n - 22; ; --i) {
    if (rd32(b + i) == 0x06054b50) { eocd = i; break; }
    if (i == scan_limit) break;
  }
  if (eocd == SIZE_MAX) return false;

  uint64_t cd_offset = rd32(b + eocd + 16);
  uint64_t cd_count = rd16(b + eocd + 10);
  // zip64? (large npz archives exceed 4GB or 65535 entries)
  if (cd_offset == 0xFFFFFFFFu || cd_count == 0xFFFF) {
    // locate zip64 EOCD locator (20 bytes before EOCD)
    if (eocd >= 20 && rd32(b + eocd - 20) == 0x07064b50) {
      uint64_t z64_eocd = rd64(b + eocd - 20 + 8);
      if (z64_eocd + 56 <= n && rd32(b + z64_eocd) == 0x06064b50) {
        cd_count = rd64(b + z64_eocd + 32);
        cd_offset = rd64(b + z64_eocd + 48);
      }
    }
  }

  uint64_t off = cd_offset;
  for (uint64_t i = 0; i < cd_count; ++i) {
    if (off + 46 > n || rd32(b + off) != 0x02014b50) return false;
    Member m;
    m.method = rd16(b + off + 10);
    m.comp_size = rd32(b + off + 20);
    m.uncomp_size = rd32(b + off + 24);
    uint16_t name_len = rd16(b + off + 28);
    uint16_t extra_len = rd16(b + off + 30);
    uint16_t comment_len = rd16(b + off + 32);
    m.header_offset = rd32(b + off + 42);
    m.name.assign((const char*)(b + off + 46), name_len);
    // zip64 extra field overrides
    uint64_t eoff = off + 46 + name_len;
    uint64_t eend = eoff + extra_len;
    while (eoff + 4 <= eend) {
      uint16_t tag = rd16(b + eoff), sz = rd16(b + eoff + 2);
      if (tag == 0x0001) {
        const uint8_t* p = b + eoff + 4;
        if (m.uncomp_size == 0xFFFFFFFFu) { m.uncomp_size = rd64(p); p += 8; }
        if (m.comp_size == 0xFFFFFFFFu) { m.comp_size = rd64(p); p += 8; }
        if (m.header_offset == 0xFFFFFFFFu) { m.header_offset = rd64(p); }
      }
      eoff += 4 + sz;
    }
    a->members.push_back(std::move(m));
    off += 46 + name_len + extra_len + comment_len;
  }
  return true;
}

// Parse the npy header of a member; fills descr/shape/data_offset.
bool parse_npy(Archive* a, Member* m) {
  if (m->parsed) return true;
  const uint8_t* b = a->base;
  // local file header: 30 bytes + name + extra
  uint64_t lh = m->header_offset;
  if (lh + 30 > a->size || rd32(b + lh) != 0x04034b50) return false;
  uint16_t name_len = rd16(b + lh + 26);
  uint16_t extra_len = rd16(b + lh + 28);
  uint64_t payload = lh + 30 + name_len + extra_len;

  std::vector<uint8_t> inflated;
  const uint8_t* npy = b + payload;
  uint64_t npy_len = m->comp_size;
  if (m->method == 8) {
    // inflate only the header region first (npy headers are < 64KB aligned)
    inflated.resize(std::min<uint64_t>(m->uncomp_size, 65536));
    z_stream zs{};
    inflateInit2(&zs, -15);
    zs.next_in = const_cast<uint8_t*>(npy);
    zs.avail_in = (uInt)std::min<uint64_t>(npy_len, 1 << 20);
    zs.next_out = inflated.data();
    zs.avail_out = (uInt)inflated.size();
    inflate(&zs, Z_SYNC_FLUSH);
    inflateEnd(&zs);
    npy = inflated.data();
    npy_len = inflated.size();
  }
  if (npy_len < 10 || memcmp(npy, "\x93NUMPY", 6) != 0) return false;
  uint8_t major = npy[6];
  uint64_t hlen, hstart;
  if (major == 1) { hlen = rd16(npy + 8); hstart = 10; }
  else { hlen = rd32(npy + 8); hstart = 12; }
  std::string header((const char*)(npy + hstart), hlen);
  // parse "descr": '<f4', "fortran_order": False, "shape": (N, D)
  auto find_val = [&](const char* key) -> std::string {
    size_t k = header.find(key);
    if (k == std::string::npos) return "";
    size_t c = header.find(':', k);
    return header.substr(c + 1);
  };
  std::string d = find_val("'descr'");
  size_t q1 = d.find('\'');
  size_t q2 = d.find('\'', q1 + 1);
  m->descr = d.substr(q1 + 1, q2 - q1 - 1);
  std::string s = find_val("'shape'");
  size_t p1 = s.find('(');
  size_t p2 = s.find(')');
  std::string dims = s.substr(p1 + 1, p2 - p1 - 1);
  m->shape.clear();
  const char* cur = dims.c_str();
  while (*cur) {
    while (*cur == ' ' || *cur == ',') ++cur;
    if (!*cur) break;
    m->shape.push_back(strtoll(cur, const_cast<char**>(&cur), 10));
  }
  m->npy_header_len = hstart + hlen;
  m->data_offset = payload + (m->method == 0 ? m->npy_header_len : 0);
  m->parsed = true;
  return true;
}

Member* find_member(Archive* a, const char* name) {
  std::string n1(name), n2 = n1 + ".npy";
  for (auto& m : a->members)
    if (m.name == n1 || m.name == n2) return &m;
  return nullptr;
}

}  // namespace

extern "C" {

void* bankio_open(const char* path) {
  Archive* a = new Archive();
  a->fd = open(path, O_RDONLY);
  if (a->fd < 0) { delete a; return nullptr; }
  struct stat st;
  fstat(a->fd, &st);
  a->size = st.st_size;
  a->base = (const uint8_t*)mmap(nullptr, a->size, PROT_READ, MAP_PRIVATE, a->fd, 0);
  if (a->base == MAP_FAILED || !parse_central_directory(a)) {
    if (a->base != MAP_FAILED) munmap((void*)a->base, a->size);
    close(a->fd);
    delete a;
    return nullptr;
  }
  return a;
}

void bankio_close(void* h) {
  Archive* a = (Archive*)h;
  if (!a) return;
  munmap((void*)a->base, a->size);
  close(a->fd);
  delete a;
}

int bankio_num_members(void* h) { return (int)((Archive*)h)->members.size(); }

const char* bankio_member_name(void* h, int i) {
  Archive* a = (Archive*)h;
  if (i < 0 || i >= (int)a->members.size()) return nullptr;
  return a->members[i].name.c_str();
}

// Fills dtype string (e.g. "<f4"), shape, ndim; returns 0 on success.
int bankio_member_info(void* h, const char* name, char* descr_out, int descr_cap,
                       long long* shape_out, int shape_cap, int* ndim_out) {
  Archive* a = (Archive*)h;
  Member* m = find_member(a, name);
  if (!m || !parse_npy(a, m)) return -1;
  snprintf(descr_out, descr_cap, "%s", m->descr.c_str());
  *ndim_out = (int)m->shape.size();
  for (int i = 0; i < *ndim_out && i < shape_cap; ++i) shape_out[i] = m->shape[i];
  return 0;
}

// 1 if the member is served zero-copy (stored); 0 if it needs inflation.
int bankio_member_is_stored(void* h, const char* name) {
  Archive* a = (Archive*)h;
  Member* m = find_member(a, name);
  if (!m || !parse_npy(a, m)) return -1;
  return m->method == 0 ? 1 : 0;
}

// Pointer straight into the mmap for stored members (zero copy), else null.
const void* bankio_member_ptr(void* h, const char* name) {
  Archive* a = (Archive*)h;
  Member* m = find_member(a, name);
  if (!m || !parse_npy(a, m) || m->method != 0) return nullptr;
  return a->base + m->data_offset;
}

long long bankio_member_nbytes(void* h, const char* name) {
  Archive* a = (Archive*)h;
  Member* m = find_member(a, name);
  if (!m || !parse_npy(a, m)) return -1;
  return (long long)(m->uncomp_size - m->npy_header_len);
}

// Copy (stored) or inflate (deflate) the array payload into dst.
int bankio_member_read(void* h, const char* name, void* dst) {
  Archive* a = (Archive*)h;
  Member* m = find_member(a, name);
  if (!m || !parse_npy(a, m)) return -1;
  if (m->method == 0) {
    memcpy(dst, a->base + m->data_offset, m->uncomp_size - m->npy_header_len);
    return 0;
  }
  // deflate: inflate the whole member, skip the npy header
  uint64_t lh = m->header_offset;
  uint16_t name_len = rd16(a->base + lh + 26);
  uint16_t extra_len = rd16(a->base + lh + 28);
  const uint8_t* src = a->base + lh + 30 + name_len + extra_len;
  std::vector<uint8_t> out(m->uncomp_size);
  z_stream zs{};
  if (inflateInit2(&zs, -15) != Z_OK) return -2;
  // Feed input/output in <4GiB slices: zlib's avail_in/avail_out are 32-bit,
  // but zip64 members may exceed 4GiB on either side.
  const uint64_t kChunk = 1u << 30;
  uint64_t in_done = 0, out_done = 0;
  int rc = Z_OK;
  while (rc == Z_OK || rc == Z_BUF_ERROR) {
    if (zs.avail_in == 0 && in_done < m->comp_size) {
      uint64_t n = std::min<uint64_t>(kChunk, m->comp_size - in_done);
      zs.next_in = const_cast<uint8_t*>(src + in_done);
      zs.avail_in = (uInt)n;
      in_done += n;
    }
    if (zs.avail_out == 0 && out_done < out.size()) {
      uint64_t n = std::min<uint64_t>(kChunk, out.size() - out_done);
      zs.next_out = out.data() + out_done;
      zs.avail_out = (uInt)n;
      out_done += n;
    }
    if (rc == Z_BUF_ERROR && zs.avail_in == 0 && in_done >= m->comp_size)
      break;  // input exhausted without reaching stream end: corrupt
    bool final = in_done >= m->comp_size;
    rc = inflate(&zs, final ? Z_FINISH : Z_NO_FLUSH);
    if (rc == Z_STREAM_END) break;
  }
  inflateEnd(&zs);
  if (rc != Z_STREAM_END) return -3;
  memcpy(dst, out.data() + m->npy_header_len, m->uncomp_size - m->npy_header_len);
  return 0;
}

}  // extern "C"
