// Native (w,k)-minimizer sketch — host hot path of the seed stage.
//
// Produces exactly the minimizer set/order of the reference's mm_sketch
// (sketch.c:77-143) and of the Python golden model (index/sketch.py), which
// this file is fuzz-validated against bit for bit (tests/test_native_sketch.py,
// plus the compiled-oracle fuzz in tests/test_hit_oracle_fuzz.py). Encoding:
// x = hash64(canonical kmer)<<8 | kmer_span, y = rid<<32 | last_pos<<1 | strand.
//
// Structure is two cooperating pieces rather than one automaton loop:
//
//   KmerSlotStream  — turns raw nt4 bases into "window slots": one slot per
//                     strand-resolvable k-mer position (symmetric k-mers are
//                     consumed without producing a slot; ambiguous bases
//                     produce an invalid slot and reset the streak).  Handles
//                     homopolymer compression with a fixed ring of the last
//                     k run lengths, and marks slots invalid when the
//                     compressed span no longer fits the 8-bit x field.
//
//   MinimizerWindow — a w-slot ring tracking the current minimum, emitting
//                     on three events: the first full window after a reset
//                     (flush every tie of the minimum except the tracked
//                     slot itself), displacement by a new <=-minimum (emit
//                     the outgoing minimum, but only once a full window has
//                     moved past it), and the minimum's slot aging out of
//                     the ring (emit it, rescan for the newest minimal slot,
//                     flush that one's ties).  These event rules — including
//                     the quirk that a minimum displaced by an equal key AT
//                     the first-full-window boundary is dropped silently —
//                     are the emission semantics every consumer (seed
//                     collection, index build, est_err mini_pos) depends on,
//                     so they are matched exactly; output stays
//                     position-sorted.
//
// Batched handle API (C ABI, loaded via ctypes): one call sketches every
// sequence in a read batch, a second call copies the packed results out and
// frees the handle. Output growth is unbounded in theory (tie storms), so
// results live in std::vector inside the handle instead of a caller guess.
#include <cstdint>
#include <cstring>
#include <cstdlib>
#include <string>
#include <vector>
#include <algorithm>
#include <mutex>
#include <queue>
#include <utility>
#include <unistd.h>

namespace {

constexpr uint64_t NONE = ~0ULL;

struct Slot {
    uint64_t key;      // x: hash<<8|span; NONE when not emittable
    uint64_t pos;      // y: rid<<32|pos<<1|strand
    int64_t streak;    // slots since the last ambiguity reset (this one incl.)
};

static inline uint64_t hash64(uint64_t v, uint64_t mask)
{
    v = (~v + (v << 21)) & mask;
    v ^= v >> 24;
    v = (v + (v << 3) + (v << 8)) & mask;
    v ^= v >> 14;
    v = (v + (v << 2) + (v << 4)) & mask;
    v ^= v >> 28;
    v = (v + (v << 31)) & mask;
    return v;
}

// nt4 bases -> window slots.  One next() call consumes bases until it can
// produce a slot (an ambiguous base, or a k-mer whose two strands differ);
// homopolymer runs collapse to their final base in HPC mode, the compressed
// span tracked as a rolling sum of the last k run lengths.
struct KmerSlotStream {
    const uint8_t* nt4;
    int64_t len, at = 0;
    int k;
    bool hpc;
    uint32_t rid;
    uint64_t mask, fwd = 0, rev = 0;
    int rev_shift;
    int64_t streak = 0, span = 0;
    std::vector<int32_t> runs;     // ring of the last <=k homopolymer runs
    int run_head = 0, run_cnt = 0;

    KmerSlotStream(const uint8_t* s, int64_t n, int k_, bool hpc_, uint32_t rid_)
        : nt4(s), len(n), k(k_), hpc(hpc_), rid(rid_),
          mask(k_ < 32 ? (1ULL << (2 * k_)) - 1 : NONE),
          rev_shift(2 * (k_ - 1)), runs(hpc_ ? (size_t)k_ : 0) {}

    void push_run(int64_t rl) {
        span += rl;
        if (run_cnt == k) {            // ring full: oldest run leaves the k-mer
            span -= runs[run_head];
            if (++run_head == k) run_head = 0;
        } else {
            ++run_cnt;
        }
        int tail = run_head + run_cnt - 1;
        if (tail >= k) tail -= k;
        runs[tail] = (int32_t)rl;
    }

    bool next(Slot& s) {
        while (at < len) {
            const int c = nt4[at];
            if (c >= 4) {                      // ambiguity: reset everything
                ++at;
                streak = span = 0;
                run_head = run_cnt = 0;
                s = Slot{NONE, NONE, 0};
                return true;
            }
            if (hpc) {
                int64_t rl = 1;
                while (at + rl < len && nt4[at + rl] == c) ++rl;
                at += rl;                      // slot sits on the run's last base
                push_run(rl);
            } else {
                ++at;
                span = streak + 1 < k ? streak + 1 : k;
            }
            fwd = ((fwd << 2) | (uint64_t)c) & mask;
            rev = (rev >> 2) | ((uint64_t)(3 ^ c) << rev_shift);
            if (fwd == rev) continue;          // strand-ambiguous: no slot
            ++streak;
            s = Slot{NONE, NONE, streak};
            if (streak >= k && span < 256) {
                const bool flip = fwd >= rev;
                s.key = hash64(flip ? rev : fwd, mask) << 8 | (uint64_t)span;
                s.pos = ((uint64_t)rid << 32) | ((uint64_t)(at - 1) << 1)
                        | (uint64_t)flip;
            }
            return true;
        }
        return false;
    }
};

// w-slot ring with tracked minimum and the three emission events.
// full_streak = w + k - 1: the streak at which a window first covers w slots.
struct MinimizerWindow {
    int w;
    int64_t full_streak;
    std::vector<Slot> ring;
    Slot low{NONE, NONE, 0};       // tracked minimum of the ring
    int low_at = 0, head = 0;      // ring indices of `low` / the next write
    std::vector<Slot>& out;

    MinimizerWindow(int w_, int k_, std::vector<Slot>& out_)
        : w(w_), full_streak((int64_t)w_ + k_ - 1),
          ring((size_t)w_, Slot{NONE, NONE, 0}), out(out_) {}

    // emit every duplicate of `low` except the tracked slot itself, oldest
    // ring position first (positions after `head` predate positions before
    // it); the just-written head slot joins the scan only when with_head.
    void flush_ties(bool with_head) {
        for (int j = head + 1; j < w; ++j)
            if (ring[j].key == low.key && ring[j].pos != low.pos)
                out.push_back(ring[j]);
        for (int j = 0; j < head + (with_head ? 1 : 0); ++j)
            if (ring[j].key == low.key && ring[j].pos != low.pos)
                out.push_back(ring[j]);
    }

    void push(const Slot& s) {
        ring[head] = s;
        // event: first full window since the last reset — ties flush now;
        // the tracked minimum itself is emitted later (on displacement,
        // age-out, or at end of sequence)
        if (s.streak == full_streak && low.key != NONE)
            flush_ties(false);
        if (s.key <= low.key) {
            // event: displaced by a new <= minimum.  Emit the outgoing one
            // only if a full window has already moved PAST it (streak >
            // full_streak) — displacement at the boundary drops it.
            if (s.streak > full_streak && low.key != NONE)
                out.push_back(low);
            low = s;
            low_at = head;
        } else if (low_at == head) {
            // event: the minimum's slot just aged out of the ring
            const bool windowed = s.streak >= full_streak;
            if (windowed && low.key != NONE) out.push_back(low);
            low = Slot{NONE, NONE, 0};
            for (int j = head + 1; j < w; ++j)     // newest duplicate wins:
                if (ring[j].key <= low.key) { low = ring[j]; low_at = j; }
            for (int j = 0; j <= head; ++j)        // <= scans oldest->newest
                if (ring[j].key <= low.key) { low = ring[j]; low_at = j; }
            if (windowed && low.key != NONE) flush_ties(true);
        }
        if (++head == w) head = 0;
    }

    void finish() { if (low.key != NONE) out.push_back(low); }
};

struct SketchOut {
    std::vector<Slot> rows;        // streak field unused on output
    std::vector<int64_t> counts;
};

static void sketch1(const uint8_t* nt4, int64_t len, int w, int k,
                    uint32_t rid, bool is_hpc, std::vector<Slot>& out)
{
    KmerSlotStream stream(nt4, len, k, is_hpc, rid);
    MinimizerWindow win(w, k, out);
    Slot s;
    while (stream.next(s)) win.push(s);
    win.finish();
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
    uint64_t* o = out;
    for (const Slot& r : h->rows) {
        *o++ = r.key;
        *o++ = r.pos;
    }
    delete h;
}

}  // extern "C"

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

// ---- streaming CSR build (r4, VERDICT r3 weak #5): the one-call
// mm2tpu_build_csr holds every minimizer pair TWICE (caller chunks + the
// sort buffer) and over-allocates ukey/starts at N — at 3 Gbp that is
// ~18 GB of the measured 31 GB build peak.  This accumulator copies each
// per-contig chunk in as it is sketched (the caller frees its array
// immediately), sorts blocks on arrival, and k-way merges straight into
// the caller's value array while recording unique keys/starts in
// exact-size native temps.  Peak holds each pair ~once plus the outputs.
// Same (key, val) total order as the one-call path — values are unique
// genome-wide, so block merge == full sort, bit for bit.

static_assert(sizeof(std::pair<uint64_t, uint64_t>) == 16,
              "spill format assumes packed 16-byte (key, value) pairs");

struct CsrAcc {
    std::vector<std::vector<std::pair<uint64_t, uint64_t>>> blocks;
    std::vector<int64_t> spill_counts;  // pairs per on-disk block, add order
    int spill_fd = -1;                  // unlinked temp file; -1 = RAM mode
    bool spill_dead = false;            // write failed: later adds go to RAM
    int64_t spill_bytes = 0;            // bytes of COMPLETE on-disk blocks
    std::vector<uint64_t> ukey;    // filled by merge
    std::vector<int64_t> starts;
    int64_t n = 0;
    std::mutex mu;                 // csr_add from -t sketch workers
    ~CsrAcc() { if (spill_fd >= 0) close(spill_fd); }
};

extern "C" void* mm2tpu_csr_begin() { return new CsrAcc(); }

// Spill mode (bounded-memory build): sorted blocks stream to an unlinked
// temp file in `dir` instead of accumulating in RAM, and the k-way merge
// reads them back through fixed-size buffers — peak block memory drops
// from all-pairs (~9 GB at 3 Gbp) to n_blocks x 1 MiB.  Same pair
// stream, same merge order (values are unique genome-wide), so the CSR
// is bit-identical to RAM mode.  Falls back to RAM mode if the temp
// file cannot be created (the build must never fail on spill setup).
extern "C" void* mm2tpu_csr_begin_spill(const char* dir)
{
    auto* a = new CsrAcc();
    std::string tmpl = std::string(dir && *dir ? dir : "/tmp")
                       + "/mm2tpu_spill_XXXXXX";
    std::vector<char> path(tmpl.begin(), tmpl.end());
    path.push_back('\0');
    int fd = mkstemp(path.data());
    if (fd >= 0) {
        unlink(path.data());   // anonymous: reclaimed even on crash
        a->spill_fd = fd;
    }
    return a;
}

static bool pwrite_all(int fd, const void* p, size_t len, int64_t off)
{
    const char* c = (const char*)p;
    while (len) {
        ssize_t w = pwrite(fd, c, len, (off_t)off);
        if (w <= 0) return false;
        c += w;
        off += w;
        len -= (size_t)w;
    }
    return true;
}

extern "C" void mm2tpu_csr_add(void* h, const uint64_t* mv, int64_t n)
{
    if (n <= 0) return;
    auto* a = (CsrAcc*)h;
    std::vector<std::pair<uint64_t, uint64_t>> b;
    b.reserve(n);
    for (int64_t i = 0; i < n; ++i)
        b.emplace_back(mv[2 * i] >> 8, mv[2 * i + 1]);
    std::sort(b.begin(), b.end());
    std::lock_guard<std::mutex> g(a->mu);
    a->n += n;
    if (a->spill_fd >= 0 && !a->spill_dead) {
        // pair<u64,u64> is 16 bytes with no padding; write the raw run at
        // the tracked offset (pwrite: a failed/partial block never moves
        // spill_bytes, so earlier complete blocks stay readable)
        size_t bytes = (size_t)n * sizeof(b[0]);
        if (pwrite_all(a->spill_fd, b.data(), bytes, a->spill_bytes)) {
            a->spill_bytes += (int64_t)bytes;
            a->spill_counts.push_back(n);
            return;
        }
        // disk full mid-build: this and later blocks fall back to RAM;
        // the complete on-disk blocks still merge (mixed-mode merge)
        a->spill_dead = true;
    }
    a->blocks.push_back(std::move(b));
}

extern "C" int64_t mm2tpu_csr_total(void* h) { return ((CsrAcc*)h)->n; }

// Spill health query: bit 0 = a spill file is active, bit 1 = a spill
// write failed and later blocks fell back to RAM.  Lets the caller warn
// when a REQUESTED bounded-memory build is silently running unbounded
// (mkstemp failure or disk-full mid-build) instead of OOMing blind.
extern "C" int mm2tpu_csr_status(void* h)
{
    auto* a = (CsrAcc*)h;
    std::lock_guard<std::mutex> g(a->mu);
    return (a->spill_fd >= 0 ? 1 : 0) | (a->spill_dead ? 2 : 0);
}

// Buffered cursor over one sorted on-disk block (spill mode): holds BUF
// pairs, refills by pread at absolute offsets (no shared file position).
struct SpillReader {
    static constexpr int64_t BUF = 1 << 16;  // pairs = 1 MiB per block
    int fd = -1;
    int64_t base = 0, npairs = 0, pos = 0, buf_start = 0;
    std::vector<std::pair<uint64_t, uint64_t>> buf;

    bool refill()
    {
        int64_t want = std::min(BUF, npairs - pos);
        buf.resize((size_t)want);
        size_t bytes = (size_t)want * sizeof(buf[0]);
        char* dst = (char*)buf.data();
        int64_t off = (base + pos) * (int64_t)sizeof(buf[0]);
        while (bytes) {
            ssize_t r = pread(fd, dst, bytes, (off_t)off);
            if (r <= 0) return false;
            dst += r;
            off += r;
            bytes -= (size_t)r;
        }
        buf_start = pos;
        return true;
    }
    const std::pair<uint64_t, uint64_t>& cur() const
    {
        return buf[(size_t)(pos - buf_start)];
    }
};

// Merge every block (in-RAM and spilled) into val[] (capacity = total),
// recording unique keys and run starts internally.  Frees the blocks.
// Returns nk (unique keys), or -1 if a spill read failed (caller must
// treat the accumulator as poisoned and abort).  Pair order is the
// global (key, value) sort — values are unique genome-wide, so the
// result is independent of how blocks were stored.
extern "C" int64_t mm2tpu_csr_merge(void* h, uint64_t* val)
{
    auto* a = (CsrAcc*)h;
    size_t nram = a->blocks.size();
    std::vector<SpillReader> spill(a->spill_counts.size());
    {
        int64_t base = 0;
        for (size_t si = 0; si < a->spill_counts.size(); ++si) {
            spill[si].fd = a->spill_fd;
            spill[si].base = base;
            spill[si].npairs = a->spill_counts[si];
            base += a->spill_counts[si];
            if (spill[si].npairs > 0 && !spill[si].refill()) return -1;
        }
    }
    using Ent = std::pair<std::pair<uint64_t, uint64_t>, size_t>;
    std::priority_queue<Ent, std::vector<Ent>, std::greater<Ent>> heap;
    std::vector<size_t> pos(nram, 0);
    for (size_t bi = 0; bi < nram; ++bi)
        if (!a->blocks[bi].empty())
            heap.push({a->blocks[bi][0], bi});
    for (size_t si = 0; si < spill.size(); ++si)
        if (spill[si].npairs > 0)
            heap.push({spill[si].cur(), nram + si});
    int64_t i = 0;
    uint64_t prev_key = 0;
    while (!heap.empty()) {
        auto [kv, bi] = heap.top();
        heap.pop();
        val[i] = kv.second;
        if (i == 0 || kv.first != prev_key) {
            a->ukey.push_back(kv.first);
            a->starts.push_back(i);
            prev_key = kv.first;
        }
        ++i;
        if (bi < nram) {
            if (++pos[bi] < a->blocks[bi].size()) {
                heap.push({a->blocks[bi][pos[bi]], bi});
            } else {
                // free exhausted blocks eagerly
                a->blocks[bi].clear();
                a->blocks[bi].shrink_to_fit();
            }
        } else {
            SpillReader& s = spill[bi - nram];
            if (++s.pos < s.npairs) {
                if (s.pos - s.buf_start >= (int64_t)s.buf.size()
                        && !s.refill())
                    return -1;
                heap.push({s.cur(), bi});
            }
        }
    }
    a->blocks.clear();
    a->blocks.shrink_to_fit();
    if (a->spill_fd >= 0) {
        close(a->spill_fd);
        a->spill_fd = -1;
    }
    a->starts.push_back(i);
    return (int64_t)a->ukey.size();
}

extern "C" void mm2tpu_csr_finish(void* h, uint64_t* ukey, int64_t* starts)
{
    auto* a = (CsrAcc*)h;
    std::memcpy(ukey, a->ukey.data(), a->ukey.size() * 8);
    std::memcpy(starts, a->starts.data(), a->starts.size() * 8);
    delete a;
}

extern "C" void mm2tpu_csr_abort(void* h) { delete (CsrAcc*)h; }
