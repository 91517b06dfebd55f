/* Firmware control task: observation assembly + mixer + failsafe around
 * the raptor inference C ABI. See raptor_control_task.h.
 *
 * Mirrors what the reference's embedded_platforms/ firmware modules do
 * around rl_tools_inference_applications_l2f_control (reference
 * README:107-167): the policy consumes the 22-dim l2f observation
 * Position(3) . RotationMatrix(9, row-major) . LinearVelocity(3) .
 * AngularVelocity(3) . LastAction(4) (ckpt.h5::actor@meta contract,
 * SURVEY A.2) and emits 4 motor commands in [-1, 1].
 */
#include "raptor_control_task.h"

/* inference C ABI (native/executor.cpp) */
extern int raptor_inference_init(int skip_test);
extern void raptor_inference_reset(void);
extern int raptor_inference_l2f_control(uint64_t time_us,
                                        const float *observation,
                                        float *action);

#define RAPTOR_FW_OBS_DIM 22
#define RAPTOR_FW_ACTION_DIM 4
/* timing watchdog level 3 / self-test / uninitialized bits of the
 * inference status (native/executor.cpp STATUS_BIT_*): any of these is a
 * hard fault for the firmware. Level 1/2 timing jitter is tolerated. */
#define RAPTOR_FW_FAULT_MASK ((1 << 2) | (1 << 3) | (1 << 4))

static struct {
    float last_action[RAPTOR_FW_ACTION_DIM]; /* policy frame, [-1, 1] */
    int booted;
    int failsafe_latched;
    int last_status;
} g_task; /* static allocation only — no heap on the flight controller */

raptor_fw_status raptor_fw_boot(int skip_self_test) {
    int i;
    for (i = 0; i < RAPTOR_FW_ACTION_DIM; ++i) g_task.last_action[i] = 0.0f;
    g_task.failsafe_latched = 0;
    g_task.last_status = 0;
    if (raptor_inference_init(skip_self_test)) {
        g_task.booted = 0;
        return RAPTOR_FW_SELF_TEST_FAILED;
    }
    g_task.booted = 1;
    return RAPTOR_FW_OK;
}

/* quaternion (w,x,y,z, body->world) to row-major rotation matrix —
 * same formula as raptor_tpu.env.maths.quat_to_rotm */
static void quat_to_rotm(const float q[4], float r[9]) {
    const float w = q[0], x = q[1], y = q[2], z = q[3];
    r[0] = 1.0f - 2.0f * (y * y + z * z);
    r[1] = 2.0f * (x * y - w * z);
    r[2] = 2.0f * (x * z + w * y);
    r[3] = 2.0f * (x * y + w * z);
    r[4] = 1.0f - 2.0f * (x * x + z * z);
    r[5] = 2.0f * (y * z - w * x);
    r[6] = 2.0f * (x * z - w * y);
    r[7] = 2.0f * (y * z + w * x);
    r[8] = 1.0f - 2.0f * (x * x + y * y);
}

raptor_fw_status raptor_fw_step(uint64_t time_us,
                                const raptor_fw_state_estimate *estimate,
                                float motor_throttle[4]) {
    float obs[RAPTOR_FW_OBS_DIM];
    float action[RAPTOR_FW_ACTION_DIM];
    int i, status;

    for (i = 0; i < RAPTOR_FW_ACTION_DIM; ++i) motor_throttle[i] = 0.0f;
    if (!g_task.booted) return RAPTOR_FW_NOT_BOOTED;
    if (g_task.failsafe_latched) return RAPTOR_FW_FAILSAFE;

    for (i = 0; i < 3; ++i) obs[i] = estimate->position[i];
    quat_to_rotm(estimate->orientation, &obs[3]);
    for (i = 0; i < 3; ++i) obs[12 + i] = estimate->linear_velocity[i];
    for (i = 0; i < 3; ++i) obs[15 + i] = estimate->angular_velocity[i];
    for (i = 0; i < RAPTOR_FW_ACTION_DIM; ++i)
        obs[18 + i] = g_task.last_action[i];

    status = raptor_inference_l2f_control(time_us, obs, action);
    g_task.last_status = status;
    if (status & RAPTOR_FW_FAULT_MASK) {
        g_task.failsafe_latched = 1; /* motors stay zeroed until reset */
        return RAPTOR_FW_FAILSAFE;
    }

    for (i = 0; i < RAPTOR_FW_ACTION_DIM; ++i) {
        g_task.last_action[i] = action[i];
        /* [-1, 1] policy frame -> [0, 1] normalized rotor throttle */
        motor_throttle[i] = 0.5f * (action[i] + 1.0f);
    }
    return RAPTOR_FW_OK;
}

void raptor_fw_reset(void) {
    int i;
    for (i = 0; i < RAPTOR_FW_ACTION_DIM; ++i) g_task.last_action[i] = 0.0f;
    g_task.failsafe_latched = 0;
    raptor_inference_reset();
}

int raptor_fw_last_inference_status(void) { return g_task.last_status; }
