// Lock-free Treiber stack with hazard-pointer reclamation.
//
// The second reclamation scheme the reference ships (SURVEY.md §2.15(a),
// lib/concurrency/stack/include/stack_lockfree_hazard_based.hpp:156) —
// complementing the split-refcount LockFreeStack (lockfree_stack.hpp).
// Trade-off vs refcounts: pop is a single publish + CAS (no per-visit
// counter RMW on the hot word), at the cost of a deferred retire-scan.
// Reclamation rides the shared HazardDomain (hazard.hpp).
#pragma once

#include <atomic>
#include <optional>
#include <utility>

#include "hazard.hpp"

namespace hpc_host {

template <typename T>
class HazardStack {
  struct Node {
    T value;
    Node* next;
    explicit Node(T v) : value(std::move(v)), next(nullptr) {}
  };
  static void deleter(void* p) { delete static_cast<Node*>(p); }

 public:
  HazardStack() : head_(nullptr) {}
  ~HazardStack() {
    Node* n = head_.load(std::memory_order_relaxed);
    while (n) {
      Node* nx = n->next;
      delete n;
      n = nx;
    }
  }
  HazardStack(const HazardStack&) = delete;
  HazardStack& operator=(const HazardStack&) = delete;

  void push(T v) {
    Node* node = new Node(std::move(v));
    node->next = head_.load(std::memory_order_relaxed);
    while (!head_.compare_exchange_weak(node->next, node,
                                        std::memory_order_release,
                                        std::memory_order_relaxed)) {
    }
  }

  std::optional<T> pop() {
    HazardGuard hp;
    for (;;) {
      Node* h = hp.protect(head_);   // validated: h stays alive
      if (!h) return std::nullopt;
      // h->next is safe to read while h is protected; on CAS success the
      // link value we pass is the one we read under protection
      if (head_.compare_exchange_strong(h, h->next,
                                        std::memory_order_acq_rel,
                                        std::memory_order_relaxed)) {
        T out = std::move(h->value);
        hp.clear();
        HazardDomain::instance().retire(h, &deleter);
        return out;
      }
    }
  }

  bool empty() const {
    return head_.load(std::memory_order_acquire) == nullptr;
  }

 private:
  alignas(64) std::atomic<Node*> head_;
};

}  // namespace hpc_host
