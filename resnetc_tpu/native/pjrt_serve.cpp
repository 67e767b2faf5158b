// Standalone C++ PJRT serving shim — the no-Python serving binary.
//
// The reference's serving story is a single native binary (main.cu: load
// weights, run the graph, print the class).  The TPU-native equivalent is a
// PJRT client: XLA owns the kernels (the same compiled program the Python
// engine runs), and this shim owns the process — dlopen a PJRT plugin
// (libaxon_pjrt.so / libtpu.so), compile an exported StableHLO module, feed
// image tensors, fetch logits.  No Python anywhere in the serving path.
//
// Usage:
//   resnetc_pjrt_serve PLUGIN.so MODEL.mlir COMPILE_OPTS.pb INPUT.f32 \
//       [N H W C] [--loop K] [--copt key=value]...
//
//   MODEL.mlir        StableHLO text/bytecode from tools/export_stablehlo.py
//   COMPILE_OPTS.pb   serialized xla.CompileOptionsProto (same exporter)
//   INPUT.f32         raw little-endian f32 NHWC tensor, N*H*W*C elements
//   --copt key=value  client-create options (PJRT_NamedValue); integer
//                     values become kInt64, everything else kString.
//                     Use key:=value to force kString for numeric values.
//                     The axon tunnel plugin needs e.g.:
//                       --copt remote_compile=1 --copt local_only=0
//                       --copt priority=0 --copt topology=v5e:1x1x1
//                       --copt n_slices=1 --copt rank=4294967295
//                       --copt session_id=<uuid>
//   The program must take ONE f32 NHWC input and return ONE f32 output
//   (logits); argmax is computed host-side per image.
//
// Build: make -C resnetc_tpu/native pjrt  (needs the TF wheel's pjrt_c_api.h)

#include <dlfcn.h>

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <chrono>
#include <string>
#include <vector>

#include "xla/pjrt/c/pjrt_c_api.h"

namespace {

const PJRT_Api* g_api = nullptr;

[[noreturn]] void Die(const std::string& msg) {
  std::fprintf(stderr, "pjrt_serve: %s\n", msg.c_str());
  std::exit(1);
}

void Check(PJRT_Error* err, const char* what) {
  if (err == nullptr) return;
  PJRT_Error_Message_Args margs;
  std::memset(&margs, 0, sizeof(margs));
  margs.struct_size = PJRT_Error_Message_Args_STRUCT_SIZE;
  margs.error = err;
  g_api->PJRT_Error_Message(&margs);
  std::string msg(margs.message, margs.message_size);
  PJRT_Error_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Error_Destroy_Args_STRUCT_SIZE;
  dargs.error = err;
  g_api->PJRT_Error_Destroy(&dargs);
  Die(std::string(what) + ": " + msg);
}

std::string ReadFile(const char* path) {
  std::FILE* f = std::fopen(path, "rb");
  if (!f) Die(std::string("cannot open ") + path);
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::string out(static_cast<size_t>(n), '\0');
  if (n > 0 && std::fread(out.data(), 1, static_cast<size_t>(n), f) !=
                   static_cast<size_t>(n))
    Die(std::string("short read on ") + path);
  std::fclose(f);
  return out;
}

void AwaitEvent(PJRT_Event* ev, const char* what) {
  if (ev == nullptr) return;
  PJRT_Event_Await_Args aargs;
  std::memset(&aargs, 0, sizeof(aargs));
  aargs.struct_size = PJRT_Event_Await_Args_STRUCT_SIZE;
  aargs.event = ev;
  Check(g_api->PJRT_Event_Await(&aargs), what);
  PJRT_Event_Destroy_Args dargs;
  std::memset(&dargs, 0, sizeof(dargs));
  dargs.struct_size = PJRT_Event_Destroy_Args_STRUCT_SIZE;
  dargs.event = ev;
  g_api->PJRT_Event_Destroy(&dargs);
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 5) {
    std::fprintf(stderr,
                 "usage: %s PLUGIN.so MODEL.mlir COMPILE_OPTS.pb INPUT.f32 "
                 "[N H W C] [--loop K] [--latency K]\n",
                 argv[0]);
    return 2;
  }
  const char* plugin_path = argv[1];
  int64_t dims[4] = {1, 224, 224, 3};
  int loop = 1;
  int latency = 0;
  std::vector<std::pair<std::string, std::string>> client_opts;
  int pos = 5;
  if (argc >= pos + 4 && argv[pos][0] != '-') {
    for (int i = 0; i < 4; ++i) dims[i] = std::atoll(argv[pos + i]);
    pos += 4;
  }
  while (pos + 1 < argc) {
    if (std::strcmp(argv[pos], "--loop") == 0) {
      loop = std::atoi(argv[pos + 1]);
      pos += 2;
    } else if (std::strcmp(argv[pos], "--latency") == 0) {
      latency = std::atoi(argv[pos + 1]);
      pos += 2;
    } else if (std::strcmp(argv[pos], "--copt") == 0) {
      std::string kv = argv[pos + 1];
      size_t eq = kv.find('=');
      if (eq == std::string::npos) Die("--copt needs key=value");
      client_opts.emplace_back(kv.substr(0, eq), kv.substr(eq + 1));
      pos += 2;
    } else {
      Die(std::string("unknown arg: ") + argv[pos]);
    }
  }
  if (pos != argc)
    Die(std::string("trailing argument without a value: ") + argv[pos]);

  // --- plugin
  void* handle = dlopen(plugin_path, RTLD_NOW | RTLD_LOCAL);
  if (!handle) Die(std::string("dlopen: ") + dlerror());
  auto get_api =
      reinterpret_cast<const PJRT_Api* (*)()>(dlsym(handle, "GetPjrtApi"));
  if (!get_api) Die("plugin has no GetPjrtApi");
  g_api = get_api();
  std::fprintf(stderr, "plugin PJRT API v%d.%d (header v%d.%d)\n",
               g_api->pjrt_api_version.major_version,
               g_api->pjrt_api_version.minor_version, PJRT_API_MAJOR,
               PJRT_API_MINOR);

  {
    PJRT_Plugin_Initialize_Args iargs;
    std::memset(&iargs, 0, sizeof(iargs));
    iargs.struct_size = PJRT_Plugin_Initialize_Args_STRUCT_SIZE;
    Check(g_api->PJRT_Plugin_Initialize(&iargs), "Plugin_Initialize");
  }

  // --- client (with optional create options)
  std::vector<PJRT_NamedValue> nvs(client_opts.size());
  for (size_t i = 0; i < client_opts.size(); ++i) {
    auto& nv = nvs[i];
    std::memset(&nv, 0, sizeof(nv));
    nv.struct_size = PJRT_NamedValue_STRUCT_SIZE;
    const std::string& v = client_opts[i].second;
    bool forced_string = !client_opts[i].first.empty() &&
                         client_opts[i].first.back() == ':';
    if (forced_string) client_opts[i].first.pop_back();  // key:=value syntax
    nv.name = client_opts[i].first.c_str();
    nv.name_size = client_opts[i].first.size();
    bool is_int = !forced_string && !v.empty() &&
                  v.find_first_not_of("0123456789") == std::string::npos;
    if (is_int) {
      nv.type = PJRT_NamedValue_kInt64;
      nv.int64_value = std::atoll(v.c_str());
      nv.value_size = 1;
    } else {
      nv.type = PJRT_NamedValue_kString;
      nv.string_value = v.c_str();
      nv.value_size = v.size();
    }
  }
  PJRT_Client_Create_Args cargs;
  std::memset(&cargs, 0, sizeof(cargs));
  cargs.struct_size = PJRT_Client_Create_Args_STRUCT_SIZE;
  cargs.create_options = nvs.data();
  cargs.num_options = nvs.size();
  Check(g_api->PJRT_Client_Create(&cargs), "Client_Create");
  PJRT_Client* client = cargs.client;

  PJRT_Client_AddressableDevices_Args devs;
  std::memset(&devs, 0, sizeof(devs));
  devs.struct_size = PJRT_Client_AddressableDevices_Args_STRUCT_SIZE;
  devs.client = client;
  Check(g_api->PJRT_Client_AddressableDevices(&devs), "AddressableDevices");
  if (devs.num_addressable_devices == 0) Die("no addressable devices");
  std::fprintf(stderr, "%zu addressable device(s)\n",
               devs.num_addressable_devices);
  PJRT_Device* device = devs.addressable_devices[0];

  // --- compile
  std::string mlir = ReadFile(argv[2]);
  std::string copts = ReadFile(argv[3]);
  PJRT_Program program;
  std::memset(&program, 0, sizeof(program));
  program.struct_size = PJRT_Program_STRUCT_SIZE;
  program.code = mlir.data();
  program.code_size = mlir.size();
  static const char kFormat[] = "mlir";
  program.format = kFormat;
  program.format_size = sizeof(kFormat) - 1;

  PJRT_Client_Compile_Args comp;
  std::memset(&comp, 0, sizeof(comp));
  comp.struct_size = PJRT_Client_Compile_Args_STRUCT_SIZE;
  comp.client = client;
  comp.program = &program;
  comp.compile_options = copts.data();
  comp.compile_options_size = copts.size();
  auto t0 = std::chrono::steady_clock::now();
  Check(g_api->PJRT_Client_Compile(&comp), "Compile");
  PJRT_LoadedExecutable* exec = comp.executable;
  std::fprintf(
      stderr, "compiled in %.1fs\n",
      std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
          .count());

  // --- input
  std::string input = ReadFile(argv[4]);
  size_t want = static_cast<size_t>(dims[0]) * dims[1] * dims[2] * dims[3] * 4;
  if (input.size() != want)
    Die("input size " + std::to_string(input.size()) + " != expected " +
        std::to_string(want));

  PJRT_Client_BufferFromHostBuffer_Args hb;
  std::memset(&hb, 0, sizeof(hb));
  hb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
  hb.client = client;
  hb.data = input.data();
  hb.type = PJRT_Buffer_Type_F32;
  hb.dims = dims;
  hb.num_dims = 4;
  hb.host_buffer_semantics =
      PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
  hb.device = device;
  Check(g_api->PJRT_Client_BufferFromHostBuffer(&hb), "BufferFromHostBuffer");
  AwaitEvent(hb.done_with_host_buffer, "host transfer");
  PJRT_Buffer* in_buf = hb.buffer;

  // --- execute (loop for a crude standalone throughput check)
  PJRT_Buffer* out_buf = nullptr;
  double exec_s = 0.0;
  for (int it = 0; it < loop; ++it) {
    PJRT_ExecuteOptions opts;
    std::memset(&opts, 0, sizeof(opts));
    opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
    PJRT_Buffer* args_row[1] = {in_buf};
    PJRT_Buffer* const* arg_lists[1] = {args_row};
    PJRT_Buffer* out_row[1] = {nullptr};
    PJRT_Buffer** out_lists[1] = {out_row};
    PJRT_Event* done[1] = {nullptr};

    PJRT_LoadedExecutable_Execute_Args ex;
    std::memset(&ex, 0, sizeof(ex));
    ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
    ex.executable = exec;
    ex.options = &opts;
    ex.argument_lists = arg_lists;
    ex.num_devices = 1;
    ex.num_args = 1;
    ex.output_lists = out_lists;
    ex.device_complete_events = done;
    auto e0 = std::chrono::steady_clock::now();
    Check(g_api->PJRT_LoadedExecutable_Execute(&ex), "Execute");
    AwaitEvent(done[0], "execute");
    exec_s +=
        std::chrono::duration<double>(std::chrono::steady_clock::now() - e0)
            .count();
    if (out_buf != nullptr) {
      PJRT_Buffer_Destroy_Args bd;
      std::memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = out_buf;
      g_api->PJRT_Buffer_Destroy(&bd);
    }
    out_buf = out_row[0];
  }

  // --- fetch
  PJRT_Buffer_ToHostBuffer_Args th;
  std::memset(&th, 0, sizeof(th));
  th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  th.src = out_buf;
  Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer(size)");
  std::vector<float> logits(th.dst_size / sizeof(float));
  std::memset(&th, 0, sizeof(th));
  th.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
  th.src = out_buf;
  th.dst = logits.data();
  th.dst_size = logits.size() * sizeof(float);
  Check(g_api->PJRT_Buffer_ToHostBuffer(&th), "ToHostBuffer");
  AwaitEvent(th.event, "device->host");

  // --- argmax per image (row-major [N, n_classes])
  size_t n = static_cast<size_t>(dims[0]);
  size_t classes = logits.size() / (n == 0 ? 1 : n);
  for (size_t i = 0; i < n; ++i) {
    const float* row = logits.data() + i * classes;
    size_t best = 0;
    for (size_t j = 1; j < classes; ++j)
      if (row[j] > row[best]) best = j;
    std::printf("image %zu: class %zu (logit %.4f)\n", i, best, row[best]);
  }
  std::fprintf(stderr,
               "%d run(s), %.2f ms/run dispatch+complete (tunnel RTT "
               "included; not a kernel benchmark)\n",
               loop, exec_s / loop * 1e3);

  // --- serving-latency mode: K FULL request round trips (host upload ->
  // execute -> device->host fetch -> argmax), each wall-timed — exactly
  // what a frontend pays per request through this binary.  This is the
  // official p50/p99 single-image serving latency path (BASELINE.md
  // config #3): zero Python, one process, the engine it times is the
  // same loaded executable that serves.  On the axon tunnel the numbers
  // include tunnel RTT; on a real serving host they are device+PCIe only.
  if (latency > 0) {
    std::vector<double> samples;
    samples.reserve(latency);
    std::vector<float> lat_logits;
    for (int it = 0; it < latency; ++it) {
      auto t0 = std::chrono::steady_clock::now();
      PJRT_Client_BufferFromHostBuffer_Args lhb;
      std::memset(&lhb, 0, sizeof(lhb));
      lhb.struct_size = PJRT_Client_BufferFromHostBuffer_Args_STRUCT_SIZE;
      lhb.client = client;
      lhb.data = input.data();
      lhb.type = PJRT_Buffer_Type_F32;
      lhb.dims = dims;
      lhb.num_dims = 4;
      lhb.host_buffer_semantics =
          PJRT_HostBufferSemantics_kImmutableUntilTransferCompletes;
      lhb.device = device;
      Check(g_api->PJRT_Client_BufferFromHostBuffer(&lhb), "lat upload");
      AwaitEvent(lhb.done_with_host_buffer, "lat host transfer");

      PJRT_ExecuteOptions opts;
      std::memset(&opts, 0, sizeof(opts));
      opts.struct_size = PJRT_ExecuteOptions_STRUCT_SIZE;
      PJRT_Buffer* args_row[1] = {lhb.buffer};
      PJRT_Buffer* const* arg_lists[1] = {args_row};
      PJRT_Buffer* out_row[1] = {nullptr};
      PJRT_Buffer** out_lists[1] = {out_row};
      PJRT_Event* done[1] = {nullptr};
      PJRT_LoadedExecutable_Execute_Args ex;
      std::memset(&ex, 0, sizeof(ex));
      ex.struct_size = PJRT_LoadedExecutable_Execute_Args_STRUCT_SIZE;
      ex.executable = exec;
      ex.options = &opts;
      ex.argument_lists = arg_lists;
      ex.num_devices = 1;
      ex.num_args = 1;
      ex.output_lists = out_lists;
      ex.device_complete_events = done;
      Check(g_api->PJRT_LoadedExecutable_Execute(&ex), "lat execute");
      AwaitEvent(done[0], "lat execute done");

      PJRT_Buffer_ToHostBuffer_Args lth;
      std::memset(&lth, 0, sizeof(lth));
      lth.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      lth.src = out_row[0];
      Check(g_api->PJRT_Buffer_ToHostBuffer(&lth), "lat size");
      lat_logits.resize(lth.dst_size / sizeof(float));
      std::memset(&lth, 0, sizeof(lth));
      lth.struct_size = PJRT_Buffer_ToHostBuffer_Args_STRUCT_SIZE;
      lth.src = out_row[0];
      lth.dst = lat_logits.data();
      lth.dst_size = lat_logits.size() * sizeof(float);
      Check(g_api->PJRT_Buffer_ToHostBuffer(&lth), "lat fetch");
      AwaitEvent(lth.event, "lat device->host");
      size_t best = 0;
      for (size_t j = 1; j < lat_logits.size() && j < 1000; ++j)
        if (lat_logits[j] > lat_logits[best]) best = j;
      (void)best;
      samples.push_back(
          std::chrono::duration<double>(std::chrono::steady_clock::now() - t0)
              .count());

      PJRT_Buffer_Destroy_Args bd;
      std::memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = out_row[0];
      g_api->PJRT_Buffer_Destroy(&bd);
      std::memset(&bd, 0, sizeof(bd));
      bd.struct_size = PJRT_Buffer_Destroy_Args_STRUCT_SIZE;
      bd.buffer = lhb.buffer;
      g_api->PJRT_Buffer_Destroy(&bd);
    }
    std::sort(samples.begin(), samples.end());
    double p50 = samples[samples.size() / 2] * 1e3;
    double p99 = samples[(size_t)(samples.size() * 0.99) >= samples.size()
                             ? samples.size() - 1
                             : (size_t)(samples.size() * 0.99)] * 1e3;
    std::printf("latency_ms {\"samples\": %d, \"p50\": %.3f, \"p99\": %.3f}\n",
                latency, p50, p99);
  }
  return 0;
}
