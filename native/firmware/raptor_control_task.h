/* Firmware-side control task wrapping the raptor inference C ABI.
 *
 * TPU-native-framework counterpart of the reference's `embedded_platforms/`
 * flight-controller integrations (PX4 / Betaflight / Crazyflie /
 * M5StampFly, reference README:107-110,123,167): the firmware owns the
 * state estimate and the motor mixer; the policy is a compiled-in blob
 * (`blob/policy.h` in the reference; our code_export header here) reached
 * through `raptor_inference_l2f_control(time_us, &obs, &action)`
 * (reference README:163).
 *
 * This module is what sits between the two: observation assembly from the
 * estimator frame convention (FLU world position, body quaternion, world
 * linear velocity, body angular velocity — reference README:27), action
 * de-normalization to rotor throttles, boot self-test gating, and a
 * failsafe that latches motors to zero on watchdog/timing faults.
 *
 * Pure C99, static allocation only, no heap, no I/O — compiles for a
 * flight-controller target as-is.
 */
#ifndef RAPTOR_CONTROL_TASK_H
#define RAPTOR_CONTROL_TASK_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

/* State estimate in the l2f frame convention (reference README:27):
 * position [m] FLU world; orientation quaternion (w,x,y,z) body->world;
 * linear velocity [m/s] world; angular velocity [rad/s] body (FLU). */
typedef struct {
    float position[3];
    float orientation[4]; /* w, x, y, z */
    float linear_velocity[3];
    float angular_velocity[3];
} raptor_fw_state_estimate;

typedef enum {
    RAPTOR_FW_OK = 0,
    RAPTOR_FW_SELF_TEST_FAILED = 1,
    RAPTOR_FW_NOT_BOOTED = 2,
    RAPTOR_FW_FAILSAFE = 3, /* watchdog fault latched; motors zeroed */
} raptor_fw_status;

/* Boot: init the inference executor, run the compiled-in golden-I/O
 * self-test (reference README:155-156; disable only for bring-up, like the
 * reference's RL_TOOLS_DISABLE_TEST). Must be called before the loop. */
raptor_fw_status raptor_fw_boot(int skip_self_test);

/* One control-loop iteration at the flight controller's rate (400-500 Hz;
 * the executor advances the GRU hidden state only at the policy-native
 * 100 Hz — reference README:132-153 FORCE_SYNC_NATIVE).
 *
 * motor_throttle[4] receives normalized rotor commands in [0, 1]
 * (policy actions in [-1, 1] de-normalized; rotor order per README:27).
 * Returns the status; on any non-OK status motor_throttle is zeroed and
 * the failsafe latches (subsequent calls keep motors at zero until
 * raptor_fw_reset()). */
raptor_fw_status raptor_fw_step(uint64_t time_us,
                                const raptor_fw_state_estimate *estimate,
                                float motor_throttle[4]);

/* Clear the failsafe latch and the recurrent policy state (e.g. on
 * disarm/rearm). */
void raptor_fw_reset(void);

/* Timing watchdog bits of the most recent inference call (see
 * native/executor.cpp STATUS_BIT_*). */
int raptor_fw_last_inference_status(void);

#ifdef __cplusplus
}
#endif

#endif /* RAPTOR_CONTROL_TASK_H */
