// Hierarchical (deadlock-avoiding) mutex.
//
// Same capability as the reference's hierarchical_lock
// (lib/concurrency/hierarchical_lock/include/hierarchical_lock.hpp:12-38):
// a runtime lock-order checker — each thread may only acquire locks with
// strictly descending levels; violations throw instead of deadlocking.
#pragma once

#include <cstdint>
#include <mutex>
#include <stdexcept>

namespace hpc_host {

class HierarchicalMutex {
 public:
  explicit HierarchicalMutex(std::uint64_t level)
      : level_(level), prev_level_(0) {}

  void lock() {
    check_violation();
    mtx_.lock();
    update_level();
  }
  void unlock() {
    if (this_thread_level() != level_)
      throw std::logic_error("hierarchical_mutex: unlock out of order");
    this_thread_level() = prev_level_;
    mtx_.unlock();
  }
  bool try_lock() {
    check_violation();
    if (!mtx_.try_lock()) return false;
    update_level();
    return true;
  }

 private:
  static std::uint64_t& this_thread_level() {
    thread_local std::uint64_t v = UINT64_MAX;
    return v;
  }
  void check_violation() {
    if (this_thread_level() <= level_)
      throw std::logic_error(
          "hierarchical_mutex: lock-order violation (would deadlock)");
  }
  void update_level() {
    prev_level_ = this_thread_level();
    this_thread_level() = level_;
  }

  std::mutex mtx_;
  std::uint64_t level_;
  std::uint64_t prev_level_;
};

}  // namespace hpc_host
