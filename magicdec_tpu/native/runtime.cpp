// Host-side native runtime for the TPU speculative-decoding engine.
//
// Two components the Python layer binds via ctypes:
//
// 1. window_pack: tokenized-corpus windowing for the data layer — the hot
//    host loop behind Data/data_converter.py:42-56's windowing contract
//    (split into seq_len windows, force BOS at window position 0), written
//    natively so multi-GB token streams pack at memcpy speed.
//
// 2. PageAllocator: a free-list KV page allocator for continuous batching
//    (the reference has none — pages are statically owned per request,
//    Engine/SnapKV/backend.py:270-287; a real allocator is the north-star
//    extension for multi-host serving, SURVEY.md §7 M6).  Per-request page
//    lists are kept contiguous in a fixed arena so the device-side page
//    tables are plain int32 arrays.
//
// Build: g++ -O3 -shared -fPIC runtime.cpp -o libmagicdec_runtime.so

#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// window packing
// ---------------------------------------------------------------------------

// tokens: concatenated token stream (int32) of length n_tokens.
// out: preallocated [max_windows, seq_len] int32.
// Returns number of windows written.  bos_id < 0 disables BOS forcing.
int64_t md_window_pack(const int32_t* tokens, int64_t n_tokens,
                       int64_t seq_len, int32_t bos_id,
                       int32_t* out, int64_t max_windows) {
  if (seq_len <= 0 || n_tokens < seq_len) return 0;
  int64_t n = n_tokens / seq_len;
  if (n > max_windows) n = max_windows;
  for (int64_t w = 0; w < n; ++w) {
    std::memcpy(out + w * seq_len, tokens + w * seq_len,
                sizeof(int32_t) * seq_len);
    if (bos_id >= 0) out[w * seq_len] = bos_id;
  }
  return n;
}

// Tiled repeat of a [n, seq_len] window matrix (reference repeats x20).
void md_tile_windows(const int32_t* windows, int64_t n, int64_t seq_len,
                     int64_t repeats, int32_t* out) {
  const int64_t bytes = sizeof(int32_t) * n * seq_len;
  for (int64_t r = 0; r < repeats; ++r) {
    std::memcpy(out + r * n * seq_len, windows, bytes);
  }
}

// ---------------------------------------------------------------------------
// page allocator
// ---------------------------------------------------------------------------

struct PageAllocator {
  int64_t total_pages;
  int64_t page_size;
  int64_t max_requests;
  int64_t pages_per_request_cap;
  std::vector<int32_t> free_list;         // stack of free page ids
  std::vector<int32_t> page_table;        // [max_requests, cap] page ids
  std::vector<int32_t> num_pages;         // [max_requests]
  std::vector<int32_t> lengths;           // [max_requests] token lengths
  std::vector<uint8_t> active;            // [max_requests]
};

void* md_allocator_new(int64_t total_pages, int64_t page_size,
                       int64_t max_requests, int64_t pages_per_request_cap) {
  auto* a = new PageAllocator();
  a->total_pages = total_pages;
  a->page_size = page_size;
  a->max_requests = max_requests;
  a->pages_per_request_cap = pages_per_request_cap;
  a->free_list.reserve(total_pages);
  for (int64_t p = total_pages - 1; p >= 0; --p)
    a->free_list.push_back(static_cast<int32_t>(p));
  a->page_table.assign(max_requests * pages_per_request_cap, -1);
  a->num_pages.assign(max_requests, 0);
  a->lengths.assign(max_requests, 0);
  a->active.assign(max_requests, 0);
  return a;
}

void md_allocator_free(void* h) { delete static_cast<PageAllocator*>(h); }

int64_t md_allocator_free_pages(void* h) {
  return static_cast<PageAllocator*>(h)->free_list.size();
}

// Admit a request with an initial token length; returns slot id or -1.
int64_t md_allocator_admit(void* h, int64_t initial_len) {
  auto* a = static_cast<PageAllocator*>(h);
  int64_t need = (initial_len + a->page_size - 1) / a->page_size;
  if (need > a->pages_per_request_cap) return -1;
  if (static_cast<int64_t>(a->free_list.size()) < need) return -1;
  for (int64_t s = 0; s < a->max_requests; ++s) {
    if (!a->active[s]) {
      a->active[s] = 1;
      a->lengths[s] = static_cast<int32_t>(initial_len);
      a->num_pages[s] = static_cast<int32_t>(need);
      for (int64_t i = 0; i < need; ++i) {
        a->page_table[s * a->pages_per_request_cap + i] = a->free_list.back();
        a->free_list.pop_back();
      }
      return s;
    }
  }
  return -1;
}

// Extend a request by n tokens, allocating pages as needed.
// Returns new length, or -1 on overflow / OOM (caller must preempt).
int64_t md_allocator_extend(void* h, int64_t slot, int64_t n_tokens) {
  auto* a = static_cast<PageAllocator*>(h);
  if (slot < 0 || slot >= a->max_requests || !a->active[slot]) return -1;
  int64_t new_len = a->lengths[slot] + n_tokens;
  int64_t need = (new_len + a->page_size - 1) / a->page_size;
  if (need > a->pages_per_request_cap) return -1;
  while (a->num_pages[slot] < need) {
    if (a->free_list.empty()) return -1;
    a->page_table[slot * a->pages_per_request_cap + a->num_pages[slot]] =
        a->free_list.back();
    a->free_list.pop_back();
    a->num_pages[slot] += 1;
  }
  a->lengths[slot] = static_cast<int32_t>(new_len);
  return new_len;
}

// Rollback a request's length by n tokens (speculative rejection); pages are
// kept (lengths govern visibility, like the reference's rollback).
int64_t md_allocator_rollback(void* h, int64_t slot, int64_t n_tokens) {
  auto* a = static_cast<PageAllocator*>(h);
  if (slot < 0 || slot >= a->max_requests || !a->active[slot]) return -1;
  if (a->lengths[slot] < n_tokens) return -1;
  a->lengths[slot] -= static_cast<int32_t>(n_tokens);
  return a->lengths[slot];
}

// Release a finished request's pages.
void md_allocator_release(void* h, int64_t slot) {
  auto* a = static_cast<PageAllocator*>(h);
  if (slot < 0 || slot >= a->max_requests || !a->active[slot]) return;
  for (int32_t i = 0; i < a->num_pages[slot]; ++i) {
    a->free_list.push_back(a->page_table[slot * a->pages_per_request_cap + i]);
    a->page_table[slot * a->pages_per_request_cap + i] = -1;
  }
  a->num_pages[slot] = 0;
  a->lengths[slot] = 0;
  a->active[slot] = 0;
}

// Export the device page tables: page_indices [max_requests, cap] (unused
// entries -1 -> caller maps to 0), lengths [max_requests].
void md_allocator_tables(void* h, int32_t* page_indices, int32_t* lengths,
                         uint8_t* active) {
  auto* a = static_cast<PageAllocator*>(h);
  std::memcpy(page_indices, a->page_table.data(),
              sizeof(int32_t) * a->page_table.size());
  std::memcpy(lengths, a->lengths.data(), sizeof(int32_t) * a->lengths.size());
  std::memcpy(active, a->active.data(), a->active.size());
}

// ---------------------------------------------------------------------------
// request scheduler (continuous-batching admission)
// ---------------------------------------------------------------------------
//
// FCFS request queue -> batch-slot assignment + per-request latency
// accounting, driving engine/serving.py's slot recycling.  The reference has
// no request-level serving at all (fixed batches, batch-global termination,
// SURVEY.md §2.2); this is the host-side half of the north-star
// continuous-batching extension, kept native so admission stays off the
// Python hot loop at production request rates.

struct Scheduler {
  int64_t n_slots;
  std::vector<int64_t> q_req;      // FIFO request ids
  std::vector<int64_t> q_arrival;  // us
  size_t q_head = 0;
  std::vector<int64_t> slot_req;   // [n_slots], -1 = free
  std::vector<int64_t> slot_start; // assignment time us
  int64_t served = 0;
  double sum_queue_us = 0.0, sum_service_us = 0.0;
};

void* md_sched_new(int64_t n_slots) {
  auto* s = new Scheduler();
  s->n_slots = n_slots;
  s->slot_req.assign(n_slots, -1);
  s->slot_start.assign(n_slots, 0);
  return s;
}

void md_sched_free(void* h) { delete static_cast<Scheduler*>(h); }

void md_sched_submit(void* h, int64_t req_id, int64_t arrival_us) {
  auto* s = static_cast<Scheduler*>(h);
  s->q_req.push_back(req_id);
  s->q_arrival.push_back(arrival_us);
}

// Assign queued requests to free slots (FCFS, ascending slot order).
// out_req/out_slot: preallocated [max_n].  Returns count assigned.
int64_t md_sched_assign(void* h, int64_t now_us, int64_t* out_req,
                        int64_t* out_slot, int64_t max_n) {
  auto* s = static_cast<Scheduler*>(h);
  int64_t n = 0;
  for (int64_t slot = 0; slot < s->n_slots && n < max_n; ++slot) {
    if (s->slot_req[slot] >= 0) continue;
    if (s->q_head >= s->q_req.size()) break;
    int64_t rid = s->q_req[s->q_head];
    s->sum_queue_us += double(now_us - s->q_arrival[s->q_head]);
    ++s->q_head;
    s->slot_req[slot] = rid;
    s->slot_start[slot] = now_us;
    out_req[n] = rid;
    out_slot[n] = slot;
    ++n;
  }
  return n;
}

// Free a slot; returns the request id that occupied it (-1 if it was free).
int64_t md_sched_complete(void* h, int64_t slot, int64_t now_us) {
  auto* s = static_cast<Scheduler*>(h);
  if (slot < 0 || slot >= s->n_slots || s->slot_req[slot] < 0) return -1;
  int64_t rid = s->slot_req[slot];
  s->slot_req[slot] = -1;
  s->sum_service_us += double(now_us - s->slot_start[slot]);
  ++s->served;
  return rid;
}

// counts: [queued, running, served]; stats: [mean_queue_us, mean_service_us]
void md_sched_counts(void* h, int64_t* counts) {
  auto* s = static_cast<Scheduler*>(h);
  counts[0] = int64_t(s->q_req.size() - s->q_head);
  int64_t running = 0;
  for (int64_t i = 0; i < s->n_slots; ++i) running += (s->slot_req[i] >= 0);
  counts[1] = running;
  counts[2] = s->served;
}

void md_sched_stats(void* h, double* stats) {
  auto* s = static_cast<Scheduler*>(h);
  int64_t assigned = s->served;
  int64_t started = int64_t(s->q_head);
  stats[0] = started ? s->sum_queue_us / double(started) : 0.0;
  stats[1] = assigned ? s->sum_service_us / double(assigned) : 0.0;
}

}  // extern "C"
