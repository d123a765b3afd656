// tario — minimal, fast tar shard indexer/reader for the host data plane.
//
// The curation pipeline streams millions of clip files out of
// shard-XXXXXX.tar archives (reference: WebDataset's Python tar streaming,
// feature_extraction/code/data/metawebdataset.py). On a TPU host the
// loader competes with decode for scarce CPU, so the tar walk is done
// natively: one pass over the 512-byte headers computes every member's
// (name, offset, size); reads are then plain pread()s at known offsets.
//
// Exposed as a tiny C ABI consumed via ctypes (no pybind11 in this image):
//   tario_index(path, &entries, &count)  -> 0 on success
//   tario_free(entries, count)
//   tario_read(path, offset, size, buf)  -> bytes read
//
// Handles ustar + GNU tar, skips non-file entries, supports GNU long
// names (type 'L').

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

extern "C" {

struct TarEntry {
  char* name;
  uint64_t offset;  // offset of the member's data, not its header
  uint64_t size;
};

static uint64_t parse_octal(const char* p, size_t n) {
  // GNU base-256 extension: high bit of first byte set
  if (static_cast<unsigned char>(p[0]) & 0x80) {
    uint64_t v = static_cast<unsigned char>(p[0]) & 0x7f;
    for (size_t i = 1; i < n; i++) {
      v = (v << 8) | static_cast<unsigned char>(p[i]);
    }
    return v;
  }
  uint64_t v = 0;
  for (size_t i = 0; i < n && p[i]; i++) {
    if (p[i] < '0' || p[i] > '7') continue;
    v = (v << 3) | static_cast<uint64_t>(p[i] - '0');
  }
  return v;
}

static bool is_zero_block(const char* block) {
  for (int i = 0; i < 512; i++) {
    if (block[i] != 0) return false;
  }
  return true;
}

int tario_index(const char* path, TarEntry** out_entries, uint64_t* out_count) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;

  uint64_t capacity = 256, count = 0;
  TarEntry* entries =
      static_cast<TarEntry*>(malloc(capacity * sizeof(TarEntry)));
  if (!entries) {
    fclose(f);
    return -2;
  }

  char block[512];
  char* longname = nullptr;
  uint64_t offset = 0;
  int zero_blocks = 0;

  while (fread(block, 1, 512, f) == 512) {
    offset += 512;
    if (is_zero_block(block)) {
      if (++zero_blocks >= 2) break;
      continue;
    }
    zero_blocks = 0;

    uint64_t size = parse_octal(block + 124, 12);
    char type = block[156];
    uint64_t data_blocks = (size + 511) / 512;

    if (type == 'L' || type == 'x' || type == 'g') {
      // 'L': GNU long name — data IS the name.
      // 'x': PAX extended header — data holds "len key=value\n" records;
      //      the 'path' key overrides the next entry's name.
      // 'g': PAX global header — skip.
      char* data = static_cast<char*>(malloc(size + 1));
      if (!data || fread(data, 1, size, f) != size) {
        free(data);
        free(longname);
        free(entries);
        fclose(f);
        return -3;
      }
      data[size] = '\0';
      if (type == 'L') {
        free(longname);
        longname = data;
      } else if (type == 'x') {
        // parse PAX records for "path"
        char* p = data;
        char* end = data + size;
        while (p < end) {
          char* sp = static_cast<char*>(memchr(p, ' ', end - p));
          if (!sp) break;
          long reclen = strtol(p, nullptr, 10);
          if (reclen <= 0 || p + reclen > end) break;
          char* eq = static_cast<char*>(memchr(sp + 1, '=', p + reclen - sp - 1));
          if (eq && strncmp(sp + 1, "path", eq - sp - 1) == 0 &&
              eq - sp - 1 == 4) {
            long vlen = (p + reclen - 1) - (eq + 1);  // strip trailing \n
            free(longname);
            longname = static_cast<char*>(malloc(vlen + 1));
            if (longname) {
              memcpy(longname, eq + 1, vlen);
              longname[vlen] = '\0';
            }
          }
          p += reclen;
        }
        free(data);
      } else {
        free(data);
      }
      uint64_t pad = data_blocks * 512 - size;
      if (pad) fseek(f, static_cast<long>(pad), SEEK_CUR);
      offset += data_blocks * 512;
      continue;
    }

    if (type == '0' || type == '\0') {  // regular file
      if (count == capacity) {
        capacity *= 2;
        TarEntry* grown = static_cast<TarEntry*>(
            realloc(entries, capacity * sizeof(TarEntry)));
        if (!grown) {
          free(longname);
          free(entries);
          fclose(f);
          return -2;
        }
        entries = grown;
      }
      char* name;
      if (longname) {
        name = longname;
        longname = nullptr;
      } else {
        // ustar prefix field (345, 155 bytes) + name field (0, 100 bytes)
        char prefix[156], shortname[101];
        memcpy(prefix, block + 345, 155);
        prefix[155] = '\0';
        memcpy(shortname, block, 100);
        shortname[100] = '\0';
        size_t plen = strnlen(prefix, 155);
        size_t nlen = strnlen(shortname, 100);
        name = static_cast<char*>(malloc(plen + nlen + 2));
        if (!name) {
          free(entries);
          fclose(f);
          return -2;
        }
        if (plen) {
          memcpy(name, prefix, plen);
          name[plen] = '/';
          memcpy(name + plen + 1, shortname, nlen + 1);
        } else {
          memcpy(name, shortname, nlen + 1);
        }
      }
      entries[count].name = name;
      entries[count].offset = offset;
      entries[count].size = size;
      count++;
    }

    if (data_blocks) fseek(f, static_cast<long>(data_blocks * 512), SEEK_CUR);
    offset += data_blocks * 512;
  }

  free(longname);
  fclose(f);
  *out_entries = entries;
  *out_count = count;
  return 0;
}

void tario_free(TarEntry* entries, uint64_t count) {
  if (!entries) return;
  for (uint64_t i = 0; i < count; i++) free(entries[i].name);
  free(entries);
}

int64_t tario_read(const char* path, uint64_t offset, uint64_t size,
                   char* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  if (fseek(f, static_cast<long>(offset), SEEK_SET) != 0) {
    fclose(f);
    return -2;
  }
  size_t got = fread(buf, 1, size, f);
  fclose(f);
  return static_cast<int64_t>(got);
}

}  // extern "C"
