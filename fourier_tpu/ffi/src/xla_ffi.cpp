// XLA-runtime-hosted execution of the native core: registers the C++
// planner/executor (fft_core.hpp) as XLA FFI custom-call handlers so jitted
// JAX programs can run it *inside* the XLA runtime — the "PJRT-hosted" half
// of the FFI design scoped in SURVEY.md §2.6 (the standalone C ABI in
// capi.cpp is the CPU-callable half, mirroring the reference's cdylib,
// fourier-ffi/src/lib.rs). Handlers are built against the XLA FFI headers
// that ship inside jaxlib (located at runtime via jax.ffi.include_dir()).
//
// Two handlers, one per dtype: fourier_tpu_xla_fft_c64 / _c128. Each takes
// one complex buffer of rank >= 1 (last axis = transform length, leading
// axes = batch), an int32 `transform` attribute carrying the ABI codes 0-4
// (fourier_tpu.Transform), and writes one buffer of the same shape.
//
// Plans are cached per length behind a mutex: XLA may invoke handlers from
// multiple threads for independent calls, and FftPlan is Send-not-Sync
// (owns scratch, fft_core.hpp:40-43) — the mutex scope covers execution.

#include <complex>
#include <cstdint>
#include <memory>
#include <mutex>
#include <unordered_map>

#include "fft_core.hpp"
#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

namespace {

template <typename T>
ffi::Error run_batch(const std::complex<T>* in, std::complex<T>* out,
                     std::size_t batch, std::size_t n, std::int32_t code) {
  if (code < 0 || code > 4)
    return ffi::Error::InvalidArgument(
        "fourier_tpu: transform code must be in [0, 4]");
  if (n == 0)
    return ffi::Error::InvalidArgument(
        "fourier_tpu: transform length must be >= 1");

  static std::mutex mu;
  static std::unordered_map<std::size_t,
                            std::unique_ptr<fourier_tpu::FftPlan<T>>>
      cache;
  std::lock_guard<std::mutex> lock(mu);
  auto& plan = cache[n];
  if (!plan) {
    plan = fourier_tpu::create_plan<T>(n);
    if (!plan) return ffi::Error::Internal("fourier_tpu: plan creation failed");
  }
  const auto t = static_cast<fourier_tpu::Transform>(code);
  for (std::size_t b = 0; b < batch; ++b)
    plan->transform(in + b * n, out + b * n, t);
  return ffi::Error::Success();
}

template <ffi::DataType DT>
ffi::Error fft_impl(ffi::Buffer<DT> x, ffi::ResultBuffer<DT> y,
                    std::int32_t transform) {
  const auto dims = x.dimensions();
  if (dims.size() < 1)
    return ffi::Error::InvalidArgument("fourier_tpu: rank >= 1 required");
  const std::size_t n = static_cast<std::size_t>(dims.back());
  std::size_t batch = 1;
  for (std::size_t i = 0; i + 1 < dims.size(); ++i)
    batch *= static_cast<std::size_t>(dims[i]);
  return run_batch(x.typed_data(), y->typed_data(), batch, n, transform);
}

ffi::Error fft_c64_impl(ffi::Buffer<ffi::C64> x, ffi::ResultBuffer<ffi::C64> y,
                        std::int32_t transform) {
  return fft_impl<ffi::C64>(x, y, transform);
}

ffi::Error fft_c128_impl(ffi::Buffer<ffi::C128> x,
                         ffi::ResultBuffer<ffi::C128> y,
                         std::int32_t transform) {
  return fft_impl<ffi::C128>(x, y, transform);
}

}  // namespace

XLA_FFI_DEFINE_HANDLER_SYMBOL(fourier_tpu_xla_fft_c64, fft_c64_impl,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::C64>>()
                                  .Ret<ffi::Buffer<ffi::C64>>()
                                  .Attr<std::int32_t>("transform"));

XLA_FFI_DEFINE_HANDLER_SYMBOL(fourier_tpu_xla_fft_c128, fft_c128_impl,
                              ffi::Ffi::Bind()
                                  .Arg<ffi::Buffer<ffi::C128>>()
                                  .Ret<ffi::Buffer<ffi::C128>>()
                                  .Attr<std::int32_t>("transform"));
