/* Platform adapters for the raptor firmware control task. See
 * raptor_platform.h and the reference's embedded_platforms/ list
 * (reference README:107-110).
 */
#include "raptor_platform.h"

#define DEG_TO_RAD 0.017453292519943295f

static struct {
    raptor_platform_config cfg;
    int selected;
    int armed;
} g_platform;

int raptor_platform_preset(int id, raptor_platform_config *cfg) {
    switch (id) {
    case RAPTOR_PLATFORM_PX4:
        /* PX4: NED world / FRD body, vehicle_attitude.q is (w,x,y,z),
         * angular rates rad/s, actuator PWM 1000..2000 us. Quad-X motor
         * numbering differs from l2f's rotor order — identity here,
         * verify at bring-up. */
        cfg->frame = RAPTOR_FRAME_NED_FRD;
        cfg->quat_order = RAPTOR_QUAT_WXYZ;
        cfg->gyro_in_deg_per_s = 0;
        cfg->rotor_map[0] = 0; cfg->rotor_map[1] = 1;
        cfg->rotor_map[2] = 2; cfg->rotor_map[3] = 3;
        cfg->out_min = 1000.0f;
        cfg->out_max = 2000.0f;
        cfg->idle_throttle = 0.05f;
        return 0;
    case RAPTOR_PLATFORM_BETAFLIGHT:
        /* Betaflight: FRD body, gyro API in deg/s, quat (w,x,y,z); position
         * and world velocity must come from an external estimator (GPS
         * rescue / companion) in NED. DShot idle default ~5.5%. */
        cfg->frame = RAPTOR_FRAME_NED_FRD;
        cfg->quat_order = RAPTOR_QUAT_WXYZ;
        cfg->gyro_in_deg_per_s = 1;
        cfg->rotor_map[0] = 0; cfg->rotor_map[1] = 1;
        cfg->rotor_map[2] = 2; cfg->rotor_map[3] = 3;
        cfg->out_min = 1000.0f;
        cfg->out_max = 2000.0f;
        cfg->idle_throttle = 0.055f;
        return 0;
    case RAPTOR_PLATFORM_CRAZYFLIE:
        /* Crazyflie: estimator state is x-forward y-left z-up (matches
         * l2f), state.attitudeQuaternion stores (x,y,z,w), sensor gyro in
         * deg/s, motor power 16-bit 0..65535. */
        cfg->frame = RAPTOR_FRAME_FLU;
        cfg->quat_order = RAPTOR_QUAT_XYZW;
        cfg->gyro_in_deg_per_s = 1;
        cfg->rotor_map[0] = 0; cfg->rotor_map[1] = 1;
        cfg->rotor_map[2] = 2; cfg->rotor_map[3] = 3;
        cfg->out_min = 0.0f;
        cfg->out_max = 65535.0f;
        cfg->idle_throttle = 0.0f;
        return 0;
    case RAPTOR_PLATFORM_M5STAMPFLY:
        /* M5StampFly: FLU estimate, rad/s gyro after its own unit
         * conversion, normalized 0..1 motor duty. */
        cfg->frame = RAPTOR_FRAME_FLU;
        cfg->quat_order = RAPTOR_QUAT_WXYZ;
        cfg->gyro_in_deg_per_s = 0;
        cfg->rotor_map[0] = 0; cfg->rotor_map[1] = 1;
        cfg->rotor_map[2] = 2; cfg->rotor_map[3] = 3;
        cfg->out_min = 0.0f;
        cfg->out_max = 1.0f;
        cfg->idle_throttle = 0.0f;
        return 0;
    default:
        return -1;
    }
}

raptor_fw_status raptor_platform_boot(int id, int skip_self_test) {
    if (raptor_platform_preset(id, &g_platform.cfg))
        return RAPTOR_FW_SELF_TEST_FAILED;
    g_platform.selected = 1;
    g_platform.armed = 0;
    return raptor_fw_boot(skip_self_test);
}

void raptor_platform_arm(void) {
    if (!g_platform.armed) {
        /* arming starts a fresh flight: clear the recurrent policy state
         * AND the executor timing baseline — without this, the first armed
         * call measures its interval against the boot-time clock and a
         * late arm trips the level-3 watchdog straight into failsafe */
        raptor_fw_reset();
        g_platform.armed = 1;
    }
}

void raptor_platform_disarm(void) {
    g_platform.armed = 0;
    /* disarm clears the failsafe latch AND the recurrent policy state —
     * a rearm must not resume a hidden state from the previous flight */
    raptor_fw_reset();
}

int raptor_platform_is_armed(void) { return g_platform.armed; }

const raptor_platform_config *raptor_platform_active_config(void) {
    return g_platform.selected ? &g_platform.cfg : 0;
}

/* world NED / body FRD -> world FLU / body FLU: conjugation by
 * C = diag(1,-1,-1) on both frames. Vectors: v' = C v. Rotation matrix:
 * R' = C R C. Quaternion (w,x,y,z) equivalent: q' = (w, x, -y, -z) — the
 * SITL test pins this identity against the matrix form. */
static void convert_estimate(const raptor_platform_config *cfg,
                             const float position[3], const float quat[4],
                             const float velocity[3], const float gyro[3],
                             raptor_fw_state_estimate *out) {
    int i;
    float q[4]; /* normalized to (w,x,y,z) */
    if (cfg->quat_order == RAPTOR_QUAT_XYZW) {
        q[0] = quat[3]; q[1] = quat[0]; q[2] = quat[1]; q[3] = quat[2];
    } else {
        for (i = 0; i < 4; ++i) q[i] = quat[i];
    }
    for (i = 0; i < 3; ++i) {
        out->position[i] = position[i];
        out->linear_velocity[i] = velocity[i];
        out->angular_velocity[i] = gyro[i];
    }
    if (cfg->gyro_in_deg_per_s)
        for (i = 0; i < 3; ++i) out->angular_velocity[i] *= DEG_TO_RAD;
    if (cfg->frame == RAPTOR_FRAME_NED_FRD) {
        for (i = 1; i < 3; ++i) {
            out->position[i] = -out->position[i];
            out->linear_velocity[i] = -out->linear_velocity[i];
            out->angular_velocity[i] = -out->angular_velocity[i];
        }
        q[2] = -q[2];
        q[3] = -q[3];
    }
    for (i = 0; i < 4; ++i) out->orientation[i] = q[i];
}

raptor_fw_status raptor_platform_step(uint64_t time_us,
                                      const float position[3],
                                      const float quat[4],
                                      const float velocity[3],
                                      const float gyro[3],
                                      float motor_out[4]) {
    raptor_fw_state_estimate est;
    float throttle[4];
    raptor_fw_status status;
    int i;
    const raptor_platform_config *cfg = &g_platform.cfg;

    for (i = 0; i < 4; ++i) motor_out[i] = cfg->out_min;
    if (!g_platform.selected) return RAPTOR_FW_NOT_BOOTED;
    if (!g_platform.armed) return RAPTOR_FW_OK; /* idle at the floor */

    convert_estimate(cfg, position, quat, velocity, gyro, &est);
    status = raptor_fw_step(time_us, &est, throttle);
    if (status != RAPTOR_FW_OK) return status; /* outputs stay at floor */

    for (i = 0; i < 4; ++i) {
        /* armed idle floor, then scale into the platform's output range */
        float t = cfg->idle_throttle
                  + (1.0f - cfg->idle_throttle) * throttle[i];
        motor_out[cfg->rotor_map[i]] =
            cfg->out_min + t * (cfg->out_max - cfg->out_min);
    }
    return RAPTOR_FW_OK;
}
