// Native (w,k)-minimizer sketch — host hot path of the seed stage.
//
// Exact semantics of the reference's mm_sketch (sketch.c:77-143), matching
// the Python golden model in index/sketch.py byte for byte: canonical strand
// via min(fwd, rev) k-mer with symmetric k-mers skipped, homopolymer
// compression via a run-length queue, all-ties emission position-sorted,
// x = hash64(kmer)<<8|span, y = rid<<32|pos<<1|strand.
//
// Batched handle API (C ABI, loaded via ctypes): one call sketches every
// sequence in a read batch, a second call copies the packed results out and
// frees the handle. Output growth is unbounded in theory (tie storms), so
// results live in std::vector inside the handle instead of a caller guess.
#include <cstdint>
#include <cstring>
#include <deque>
#include <vector>
#include <algorithm>
#include <utility>

namespace {

struct Mini { uint64_t x, y; };

struct SketchOut {
    std::vector<Mini> rows;
    std::vector<int64_t> counts;
};

static inline uint64_t hash64(uint64_t key, uint64_t mask)
{
    key = (~key + (key << 21)) & mask;
    key = key ^ (key >> 24);
    key = ((key + (key << 3)) + (key << 8)) & mask;
    key = key ^ (key >> 14);
    key = ((key + (key << 2)) + (key << 4)) & mask;
    key = key ^ (key >> 28);
    key = (key + (key << 31)) & mask;
    return key;
}

static const uint64_t U64MAX = ~0ULL;

// one sequence; nt4: 0..3 bases, >=4 ambiguous. Appends to out.
static void sketch1(const uint8_t* nt4, int64_t len, int w, int k,
                    uint32_t rid, bool is_hpc, std::vector<Mini>& out)
{
    const int shift1 = 2 * (k - 1);
    const uint64_t mask = (k < 32) ? ((1ULL << (2 * k)) - 1) : U64MAX;
    uint64_t kmer0 = 0, kmer1 = 0;
    int64_t kmer_span = 0;
    std::deque<int32_t> tq;          // homopolymer run lengths
    std::vector<Mini> buf(w, Mini{U64MAX, U64MAX});
    Mini minv{U64MAX, U64MAX};
    int min_pos = 0;
    int64_t i = 0, l = 0;
    int buf_pos = 0;

    for (i = 0; i < len; ++i) {
        int c = nt4[i];
        Mini info{U64MAX, U64MAX};
        if (c < 4) {
            if (is_hpc) {
                int64_t skip_len = 1;
                if (i + 1 < len && nt4[i + 1] == c) {
                    skip_len = 2;
                    while (i + skip_len < len && nt4[i + skip_len] == c)
                        ++skip_len;
                    i += skip_len - 1;   // land on run end
                }
                tq.push_back((int32_t)skip_len);
                kmer_span += skip_len;
                if ((int)tq.size() > k) {
                    kmer_span -= tq.front();
                    tq.pop_front();
                }
            } else {
                kmer_span = l + 1 < k ? l + 1 : k;
            }
            kmer0 = ((kmer0 << 2) | (uint64_t)c) & mask;
            kmer1 = (kmer1 >> 2) | ((uint64_t)(3 ^ c) << shift1);
            if (kmer0 == kmer1) continue;   // symmetric: strand unknown
            int z = kmer0 < kmer1 ? 0 : 1;
            ++l;
            if (l >= k && kmer_span < 256) {
                info.x = hash64(z ? kmer1 : kmer0, mask) << 8
                         | (uint64_t)kmer_span;
                info.y = ((uint64_t)rid << 32) | ((uint64_t)i << 1)
                         | (uint64_t)z;
            }
        } else {
            l = 0;
            tq.clear();
            kmer_span = 0;
        }
        buf[buf_pos] = info;
        if (l == w + k - 1 && minv.x != U64MAX) {
            // first full window: emit ties, oldest first
            for (int j = buf_pos + 1; j < w; ++j)
                if (minv.x == buf[j].x && buf[j].y != minv.y)
                    out.push_back(buf[j]);
            for (int j = 0; j < buf_pos; ++j)
                if (minv.x == buf[j].x && buf[j].y != minv.y)
                    out.push_back(buf[j]);
        }
        if (info.x <= minv.x) {
            if (l >= w + k && minv.x != U64MAX) out.push_back(minv);
            minv = info;
            min_pos = buf_pos;
        } else if (buf_pos == min_pos) {
            if (l >= w + k - 1 && minv.x != U64MAX) out.push_back(minv);
            minv = Mini{U64MAX, U64MAX};
            // >= keeps the newest equal k-mer as the new min
            for (int j = buf_pos + 1; j < w; ++j)
                if (minv.x >= buf[j].x) { minv = buf[j]; min_pos = j; }
            for (int j = 0; j <= buf_pos; ++j)
                if (minv.x >= buf[j].x) { minv = buf[j]; min_pos = j; }
            if (l >= w + k - 1 && minv.x != U64MAX) {
                for (int j = buf_pos + 1; j < w; ++j)
                    if (minv.x == buf[j].x && minv.y != buf[j].y)
                        out.push_back(buf[j]);
                for (int j = 0; j <= buf_pos; ++j)
                    if (minv.x == buf[j].x && minv.y != buf[j].y)
                        out.push_back(buf[j]);
            }
        }
        if (++buf_pos == w) buf_pos = 0;
    }
    if (minv.x != U64MAX) out.push_back(minv);
}

}  // namespace

extern "C" {

// Sketch n_seqs sequences (nt4-encoded, concatenated; seq s spans
// offs[s]..offs[s+1]). rids[s] is the y-field rid. Writes per-seq row counts
// into out_counts[n_seqs]; returns an opaque handle holding the rows.
void* mm2tpu_sketch_batch(const uint8_t* nt4, const int64_t* offs,
                          int64_t n_seqs, int32_t w, int32_t k,
                          const uint32_t* rids, int32_t is_hpc,
                          int64_t* out_counts)
{
    auto* h = new SketchOut();
    h->counts.resize(n_seqs);
    for (int64_t s = 0; s < n_seqs; ++s) {
        size_t before = h->rows.size();
        int64_t len = offs[s + 1] - offs[s];
        if (len > 0)
            sketch1(nt4 + offs[s], len, w, k, rids[s], is_hpc != 0, h->rows);
        h->counts[s] = (int64_t)(h->rows.size() - before);
        out_counts[s] = h->counts[s];
    }
    return h;
}

// Copy all rows ((x, y) uint64 pairs, sequences back to back) into out and
// free the handle.
void mm2tpu_sketch_take(void* handle, uint64_t* out)
{
    auto* h = (SketchOut*)handle;
    if (!h->rows.empty())
        std::memcpy(out, h->rows.data(), h->rows.size() * sizeof(Mini));
    delete h;
}

}  // extern "C"

// ---- index-build helper: sort (key, val) pairs by key then val
// (the radix_sort_128x + per-bucket value sort of index.c:349/394).
extern "C" void mm2tpu_sort_kv(uint64_t* keys, uint64_t* vals, int64_t n)
{
    std::vector<std::pair<uint64_t, uint64_t>> kv(n);
    for (int64_t i = 0; i < n; ++i) kv[i] = {keys[i], vals[i]};
    std::sort(kv.begin(), kv.end());
    for (int64_t i = 0; i < n; ++i) {
        keys[i] = kv[i].first;
        vals[i] = kv[i].second;
    }
}

// ---- whole CSR build in one call: split per-contig minimizer arrays into
// (key = x>>8, val = y) pairs, sort by (key, val) (index.c:349/394), and
// emit unique keys + run starts.  mvs: n_arr pointers to (ns[a] x 2) u64
// row-major arrays.  ukey/starts capacity N(+1), val capacity N, where
// N = sum(ns).  Returns the unique-key count.
extern "C" int64_t mm2tpu_build_csr(
    const uint64_t* const* mvs, const int64_t* ns, int64_t n_arr,
    uint64_t* ukey, uint64_t* val, int64_t* starts)
{
    int64_t N = 0;
    for (int64_t a = 0; a < n_arr; ++a) N += ns[a];
    std::vector<std::pair<uint64_t, uint64_t>> kv;
    kv.reserve(N);
    for (int64_t a = 0; a < n_arr; ++a) {
        const uint64_t* m = mvs[a];
        for (int64_t i = 0; i < ns[a]; ++i)
            kv.emplace_back(m[2 * i] >> 8, m[2 * i + 1]);
    }
    std::sort(kv.begin(), kv.end());
    int64_t nk = 0;
    for (int64_t i = 0; i < N; ++i) {
        val[i] = kv[i].second;
        if (i == 0 || kv[i].first != kv[i - 1].first) {
            ukey[nk] = kv[i].first;
            starts[nk++] = i;
        }
    }
    starts[nk] = N;
    return nk;
}
