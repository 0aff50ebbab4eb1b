// kgt_native — native host-ingest kernels for the TPU build.
//
// Capability parity with the reference's native ingest hot path:
//   - BGZF parallel-block decompression (kel_io/kel_bzip_workflow.h:42:
//     1 reader -> N zlib inflate threads -> ordered output)
//   - VCF genotype-column tokenisation (the per-record x per-sample
//     GT/AD/DP/GQ split that the reference runs on 50 consumer threads,
//     kgl_parser/kgl_variant_factory_pf_impl.cpp:110-380)
//
// Exposed as a C ABI for ctypes (no pybind11 in this environment).
// Build: g++ -O3 -march=native -shared -fPIC -o libkgt_native.so kgt_native.cpp -lz -lpthread

#include <atomic>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <cstdio>
#include <future>
#include <string>
#include <thread>
#include <vector>

#include <zlib.h>

namespace {

// ---------------------------------------------------------------------------
// BGZF
// ---------------------------------------------------------------------------
struct BgzfBlock {
  std::vector<uint8_t> compressed;  // deflate payload (no header/footer)
  uint32_t isize = 0;
  uint32_t crc32_expect = 0;
};

// Parse BGZF blocks out of a raw file image. Returns false on framing error.
bool split_blocks(const uint8_t* data, size_t size, std::vector<BgzfBlock>& blocks) {
  size_t pos = 0;
  while (pos + 18 <= size) {
    if (data[pos] != 0x1f || data[pos + 1] != 0x8b) return false;
    uint16_t xlen = static_cast<uint16_t>(data[pos + 10]) |
                    (static_cast<uint16_t>(data[pos + 11]) << 8);
    // find BC subfield for BSIZE
    size_t extra = pos + 12;
    size_t extra_end = extra + xlen;
    if (extra_end > size) return false;
    uint32_t bsize = 0;
    size_t sub = extra;
    while (sub + 4 <= extra_end) {
      uint8_t si1 = data[sub], si2 = data[sub + 1];
      uint16_t slen = static_cast<uint16_t>(data[sub + 2]) |
                      (static_cast<uint16_t>(data[sub + 3]) << 8);
      if (si1 == 'B' && si2 == 'C' && slen == 2) {
        bsize = (static_cast<uint32_t>(data[sub + 4]) |
                 (static_cast<uint32_t>(data[sub + 5]) << 8)) + 1;
      }
      sub += 4 + slen;
    }
    if (bsize == 0 || pos + bsize > size) return false;
    size_t comp_begin = extra_end;
    size_t comp_end = pos + bsize - 8;  // crc32 + isize trailer
    BgzfBlock block;
    block.compressed.assign(data + comp_begin, data + comp_end);
    std::memcpy(&block.crc32_expect, data + comp_end, 4);
    std::memcpy(&block.isize, data + comp_end + 4, 4);
    blocks.push_back(std::move(block));
    pos += bsize;
  }
  return pos == size;
}

bool inflate_block(const BgzfBlock& block, uint8_t* out) {
  if (block.isize == 0) return true;
  z_stream zs{};
  if (inflateInit2(&zs, -15) != Z_OK) return false;
  zs.next_in = const_cast<uint8_t*>(block.compressed.data());
  zs.avail_in = static_cast<uInt>(block.compressed.size());
  zs.next_out = out;
  zs.avail_out = block.isize;
  int rc = inflate(&zs, Z_FINISH);
  inflateEnd(&zs);
  return rc == Z_STREAM_END && zs.total_out == block.isize;
}

}  // namespace

extern "C" {

// Decompress a whole BGZF file with parallel block inflate.
// Returns a malloc'd buffer (caller frees with kgt_free); *out_size is the
// uncompressed length. Returns nullptr on error.
char* kgt_bgzf_decompress(const char* path, int n_threads, size_t* out_size) {
  *out_size = 0;
  FILE* f = std::fopen(path, "rb");
  if (!f) return nullptr;
  std::fseek(f, 0, SEEK_END);
  long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> raw(static_cast<size_t>(fsize));
  if (fsize > 0 && std::fread(raw.data(), 1, raw.size(), f) != raw.size()) {
    std::fclose(f);
    return nullptr;
  }
  std::fclose(f);

  std::vector<BgzfBlock> blocks;
  if (!split_blocks(raw.data(), raw.size(), blocks)) return nullptr;

  // Prefix offsets of each block in the output.
  std::vector<size_t> offsets(blocks.size() + 1, 0);
  for (size_t i = 0; i < blocks.size(); ++i)
    offsets[i + 1] = offsets[i] + blocks[i].isize;
  size_t total = offsets.back();
  char* out = static_cast<char*>(std::malloc(total ? total : 1));
  if (!out) return nullptr;

  std::atomic<size_t> next{0};
  std::atomic<bool> ok{true};
  int workers = n_threads > 0 ? n_threads : 1;
  std::vector<std::thread> pool;
  for (int t = 0; t < workers; ++t) {
    pool.emplace_back([&] {
      size_t i;
      while ((i = next.fetch_add(1)) < blocks.size()) {
        if (!inflate_block(blocks[i],
                           reinterpret_cast<uint8_t*>(out) + offsets[i]))
          ok.store(false);
      }
    });
  }
  for (auto& th : pool) th.join();
  if (!ok.load()) {
    std::free(out);
    return nullptr;
  }
  *out_size = total;
  return out;
}

void kgt_free(void* p) { std::free(p); }

// ---------------------------------------------------------------------------
// VCF genotype-column tokenizer.
//
// Parse the genotype columns of ONE data line (the text AFTER the 9 fixed
// fields) into flat arrays:
//   gt_a, gt_b        (int32[n_samples])  allele indices; -1 = missing
//   ad                (int32[n_samples * (n_alleles + 1)]) allele depths
//   dp                (int32[n_samples])
//   gq                (float[n_samples])
// Index positions of GT/AD/DP/GQ within the FORMAT string are passed in
// (-1 = absent). Returns the number of samples parsed.
// ---------------------------------------------------------------------------
int kgt_vcf_parse_genotypes(const char* text, long len, int n_samples,
                            int n_alleles, int gt_idx, int ad_idx, int dp_idx,
                            int gq_idx, int32_t* gt_a, int32_t* gt_b,
                            int32_t* ad, int32_t* dp, float* gq,
                            int32_t* ad_count) {
  const char* p = text;
  const char* end = text + len;
  int sample = 0;
  int ad_width = n_alleles + 1;

  while (p < end && sample < n_samples) {
    // defaults
    gt_a[sample] = -1;
    gt_b[sample] = -1;
    dp[sample] = 0;
    gq[sample] = 0.0f;
    ad_count[sample] = 0;
    for (int a = 0; a < ad_width; ++a) ad[sample * ad_width + a] = 0;

    // scan one tab-delimited genotype column, splitting on ':'
    int field = 0;
    const char* fstart = p;
    while (true) {
      bool at_end = (p >= end) || (*p == '\t') || (*p == '\n');
      if (at_end || *p == ':') {
        long flen = p - fstart;
        if (field == gt_idx && flen > 0 && !(flen == 1 && *fstart == '.')) {
          // parse a[/|]b
          const char* q = fstart;
          long a_val = -1, b_val = -1;
          if (*q >= '0' && *q <= '9') {
            a_val = 0;
            while (q < fstart + flen && *q >= '0' && *q <= '9')
              a_val = a_val * 10 + (*q++ - '0');
          } else if (*q == '.') {
            ++q;
            a_val = -1;
          }
          if (q < fstart + flen && (*q == '/' || *q == '|')) {
            ++q;
            if (q < fstart + flen && *q >= '0' && *q <= '9') {
              b_val = 0;
              while (q < fstart + flen && *q >= '0' && *q <= '9')
                b_val = b_val * 10 + (*q++ - '0');
            }
          }
          gt_a[sample] = static_cast<int32_t>(a_val);
          gt_b[sample] = static_cast<int32_t>(b_val);
        } else if (field == ad_idx && flen > 0 && *fstart != '.') {
          const char* q = fstart;
          int slot = 0;
          long v = 0;
          bool have = false;
          while (q <= fstart + flen) {
            if (q == fstart + flen || *q == ',') {
              if (have && slot < ad_width) ad[sample * ad_width + slot] = static_cast<int32_t>(v);
              ++slot;
              v = 0;
              have = false;
              if (q == fstart + flen) break;
            } else if (*q >= '0' && *q <= '9') {
              v = v * 10 + (*q - '0');
              have = true;
            }
            ++q;
          }
          ad_count[sample] = slot;
        } else if (field == dp_idx && flen > 0 && *fstart != '.') {
          long v = 0;
          for (const char* q = fstart; q < fstart + flen; ++q)
            if (*q >= '0' && *q <= '9') v = v * 10 + (*q - '0');
          dp[sample] = static_cast<int32_t>(v);
        } else if (field == gq_idx && flen > 0 && *fstart != '.') {
          gq[sample] = std::strtof(fstart, nullptr);
        }
        ++field;
        if (at_end) break;
        fstart = p + 1;
      }
      ++p;
    }
    ++sample;
    if (p < end && (*p == '\t')) ++p;
    if (p < end && *p == '\n') break;
  }
  return sample;
}

// Count '\n' characters (line counting for chunked readers).
long kgt_count_lines(const char* text, long len) {
  long count = 0;
  for (long i = 0; i < len; ++i)
    if (text[i] == '\n') ++count;
  return count;
}

}  // extern "C"
