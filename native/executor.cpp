// Native inference executor: multi-rate real-time wrapper around the
// exported policy, with a C ABI for flight-controller firmware.
//
// Capability mirror of the reference's inference executor + l2f C backend
// (reference README:111-165, SURVEY §3.6/§4.5):
//   - policy native rate 100 Hz (CONTROL_INTERVAL_NATIVE_NS = 1e7), flight
//     controller calls at 400-500 Hz (CONTROL_INTERVAL_INTERMEDIATE_NS =
//     2.5e6): every call runs a forward pass WITHOUT committing the GRU
//     hidden state; every FORCE_SYNC_NATIVE-th call commits (100 Hz).
//   - timing-statistics window (TIMING_STATS_NUM_STEPS) + watchdog warning
//     levels reported in the status bitmask.
//   - static allocation only (DYNAMIC_ALLOCATION=false equivalent).
//   - startup self-test replaying embedded golden example I/O.
//
// Build (see raptor_tpu/inference/native.py):
//   g++ -O2 -shared -fPIC -std=c++17 -include <generated policy header> \
//       executor.cpp -o libraptor_executor.so

#include <cmath>
#include <cstdint>
#include <cstring>

// The policy header (weights + evaluate_step + self_test) is injected with
// -include at build time and provides namespace raptor_checkpoint.

namespace {

struct Config {
    uint64_t control_interval_intermediate_ns = 2500000;  // 400 Hz calls
    uint64_t control_interval_native_ns = 10000000;       // 100 Hz policy
    uint32_t force_sync_native = 4;  // commit hidden state every 4th call
    uint32_t timing_stats_num_steps = 100;
    // timing watchdog thresholds: deviation ratios for warning levels 1..3
    float warning_levels[3] = {1.05f, 1.25f, 2.0f};
};

struct TimingStats {
    uint64_t intervals_ns[1024];
    uint32_t count = 0;
    uint32_t head = 0;
};

struct Executor {
    Config config;
    float hidden[raptor_checkpoint::HIDDEN_DIM];
    uint64_t last_call_ns = 0;
    bool has_last_call = false;  // t=0 is a valid first timestamp (boot clocks)
    uint64_t call_count = 0;
    bool initialized = false;
    TimingStats stats;
};

Executor g_executor;

constexpr int STATUS_OK = 0;
constexpr int STATUS_BIT_TIMING_L1 = 1 << 0;
constexpr int STATUS_BIT_TIMING_L2 = 1 << 1;
constexpr int STATUS_BIT_TIMING_L3 = 1 << 2;
constexpr int STATUS_BIT_SELF_TEST_FAILED = 1 << 3;
constexpr int STATUS_BIT_NOT_INITIALIZED = 1 << 4;

int timing_status(Executor& ex, uint64_t now_ns) {
    if (!ex.has_last_call) return STATUS_OK;
    const uint64_t dt = now_ns - ex.last_call_ns;
    const uint32_t n = ex.config.timing_stats_num_steps < 1024u
                           ? ex.config.timing_stats_num_steps
                           : 1024u;
    ex.stats.intervals_ns[ex.stats.head] = dt;
    ex.stats.head = (ex.stats.head + 1) % n;
    if (ex.stats.count < n) ex.stats.count++;
    const float expected = (float)ex.config.control_interval_intermediate_ns;
    const float ratio = dt > (uint64_t)expected
                            ? (float)dt / expected
                            : expected / (float)(dt ? dt : 1);
    int status = STATUS_OK;
    if (ratio > ex.config.warning_levels[2]) status |= STATUS_BIT_TIMING_L3;
    else if (ratio > ex.config.warning_levels[1]) status |= STATUS_BIT_TIMING_L2;
    else if (ratio > ex.config.warning_levels[0]) status |= STATUS_BIT_TIMING_L1;
    return status;
}

}  // namespace

extern "C" {

// Initialize (and run the embedded self-test unless skip_test). Returns 0 on
// success, STATUS_BIT_SELF_TEST_FAILED on golden-I/O mismatch.
int raptor_inference_init(int skip_test) {
    g_executor = Executor{};
    raptor_checkpoint::reset(g_executor.hidden);
    g_executor.initialized = true;
    if (!skip_test) {
        const float err = raptor_checkpoint::self_test();
        if (err > 1e-4f) return STATUS_BIT_SELF_TEST_FAILED;
    }
    return STATUS_OK;
}

void raptor_inference_reset() {
    raptor_checkpoint::reset(g_executor.hidden);
    g_executor.last_call_ns = 0;
    g_executor.has_last_call = false;
    g_executor.call_count = 0;
    g_executor.stats = TimingStats{};
}

// The control entry point (reference C ABI shape:
// rl_tools_inference_applications_l2f_control(time_us, &obs, &action)).
// obs: float[22], action: float[4]; returns status bitmask.
int raptor_inference_l2f_control(uint64_t time_us, const float* observation,
                                 float* action) {
    Executor& ex = g_executor;
    if (!ex.initialized) return STATUS_BIT_NOT_INITIALIZED;
    const uint64_t now_ns = time_us * 1000ull;
    int status = timing_status(ex, now_ns);
    ex.last_call_ns = now_ns;
    ex.has_last_call = true;
    // commit the recurrent state only at the policy's native 100 Hz rate
    const bool commit =
        (ex.call_count % ex.config.force_sync_native) == 0;
    raptor_checkpoint::evaluate_step(observation, ex.hidden, action, commit);
    ex.call_count++;
    for (std::size_t i = 0; i < raptor_checkpoint::ACTION_DIM; ++i) {
        if (action[i] > 1.0f) action[i] = 1.0f;
        if (action[i] < -1.0f) action[i] = -1.0f;
    }
    return status;
}

float raptor_inference_self_test() { return raptor_checkpoint::self_test(); }

// timing stats over the window: mean/max interval in ns
void raptor_inference_timing_stats(double* mean_ns, double* max_ns) {
    const TimingStats& s = g_executor.stats;
    double sum = 0.0, mx = 0.0;
    for (uint32_t i = 0; i < s.count; ++i) {
        sum += (double)s.intervals_ns[i];
        if ((double)s.intervals_ns[i] > mx) mx = (double)s.intervals_ns[i];
    }
    *mean_ns = s.count ? sum / s.count : 0.0;
    *max_ns = mx;
}

uint64_t raptor_inference_call_count() { return g_executor.call_count; }

void raptor_inference_configure(uint64_t intermediate_ns, uint64_t native_ns,
                                uint32_t force_sync_native,
                                uint32_t timing_window) {
    g_executor.config.control_interval_intermediate_ns = intermediate_ns;
    g_executor.config.control_interval_native_ns = native_ns;
    g_executor.config.force_sync_native = force_sync_native;
    g_executor.config.timing_stats_num_steps = timing_window;
}

}  // extern "C"
