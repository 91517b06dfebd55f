/* Platform integration layer: the four `embedded_platforms/` flight-stack
 * adapters of the reference (PX4 / Betaflight / Crazyflie / M5StampFly,
 * reference README:107-110) as ONE parameterized C99 module.
 *
 * Each flight stack differs from the l2f policy contract (README:27) in
 * mechanical, testable ways:
 *   - frame convention: l2f is FLU world / FLU body; PX4 & Betaflight are
 *     NED world / FRD body (conversion: conjugate by diag(1,-1,-1));
 *   - gyro units: Crazyflie/Betaflight sensor APIs report deg/s;
 *   - quaternion component order: Crazyflie stores (x,y,z,w);
 *   - motor outputs: PWM microseconds (PX4/Betaflight 1000..2000),
 *     16-bit duty (Crazyflie 0..65535), normalized duty (M5StampFly), with
 *     a per-platform armed idle floor and a rotor-index permutation;
 *   - arming: motors must be at the disarmed floor until armed, and
 *     disarm must clear the recurrent policy state (raptor_fw_reset).
 *
 * The adapter normalizes all of that and forwards to the generic control
 * task (raptor_control_task.h), which owns obs assembly, the 100 Hz policy
 * sync, boot self-test gating, and the failsafe latch.
 *
 * Rotor-order presets follow each platform's conventional quad-X numbering
 * mapped onto the l2f rotor order; like every motor map, VERIFY ON THE
 * BENCH at bring-up (props off) — a wrong permutation is uncontrollable
 * but test-invisible in symmetric hover.
 *
 * Pure C99, static allocation, no heap, no I/O.
 */
#ifndef RAPTOR_PLATFORM_H
#define RAPTOR_PLATFORM_H

#include <stdint.h>

#include "raptor_control_task.h"

#ifdef __cplusplus
extern "C" {
#endif

typedef enum {
    RAPTOR_FRAME_FLU = 0, /* l2f native: world + body x-forward y-left z-up */
    RAPTOR_FRAME_NED_FRD = 1, /* PX4/Betaflight: world NED, body FRD */
} raptor_frame_convention;

typedef enum {
    RAPTOR_QUAT_WXYZ = 0,
    RAPTOR_QUAT_XYZW = 1, /* Crazyflie state.attitudeQuaternion layout */
} raptor_quat_order;

typedef struct {
    raptor_frame_convention frame;
    raptor_quat_order quat_order;
    int gyro_in_deg_per_s; /* 1: sensor API reports deg/s */
    uint8_t rotor_map[4];  /* platform motor index for each l2f rotor i */
    float out_min;         /* motor output at zero throttle (armed) */
    float out_max;         /* motor output at full throttle */
    float idle_throttle;   /* armed idle floor in normalized [0,1] throttle */
} raptor_platform_config;

typedef enum {
    RAPTOR_PLATFORM_PX4 = 0,
    RAPTOR_PLATFORM_BETAFLIGHT = 1,
    RAPTOR_PLATFORM_CRAZYFLIE = 2,
    RAPTOR_PLATFORM_M5STAMPFLY = 3,
} raptor_platform_id;

/* Fill *cfg with the preset for a platform id; returns 0, or -1 on an
 * unknown id (cfg untouched). */
int raptor_platform_preset(int id, raptor_platform_config *cfg);

/* Select the active platform preset + boot the control task (self-test
 * gated, see raptor_fw_boot). Motors disarmed after boot. */
raptor_fw_status raptor_platform_boot(int id, int skip_self_test);

/* Arming state machine: while disarmed, raptor_platform_step outputs the
 * disarmed floor (out_min) and does NOT advance the policy. Disarm clears
 * the failsafe latch and the recurrent policy state. */
void raptor_platform_arm(void);
void raptor_platform_disarm(void);
int raptor_platform_is_armed(void);

/* One control-loop call in the PLATFORM's own conventions:
 *   position[3], velocity[3]   world frame of the platform
 *   quat[4]                    platform component order, body->world
 *   gyro[3]                    body rates in the platform's units
 *   motor_out[4]               platform motor outputs, platform motor order
 * Faults behave as raptor_fw_step (failsafe latches, outputs at the
 * disarmed floor). */
raptor_fw_status raptor_platform_step(uint64_t time_us,
                                      const float position[3],
                                      const float quat[4],
                                      const float velocity[3],
                                      const float gyro[3],
                                      float motor_out[4]);

/* Introspection for tests / bring-up. */
const raptor_platform_config *raptor_platform_active_config(void);

#ifdef __cplusplus
}
#endif

#endif /* RAPTOR_PLATFORM_H */
