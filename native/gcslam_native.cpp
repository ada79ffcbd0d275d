// gcslam_native: native bag-decode path (the data-loader role the reference
// fills with its C++ ROS nodes, src/camera_rgbd_node.cpp / src/visual_feature_node.cpp
// plus rclpy deserialization). The TPU build replays bags offline; the hot
// host-side loop is CDR decode + PointCloud2 field extraction for ~8k points
// x thousands of scans, which this library does in one pass per message.
//
// Plain C ABI (ctypes-friendly). Little-endian XCDR1 payloads only (the
// rosbag2 default); the Python fallback handles anything exotic.
//
// Build: make -C native   (g++ -O3 -march=native -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <cmath>
#include <vector>

namespace {

struct Reader {
    const uint8_t* buf;
    size_t len;
    size_t off;  // absolute offset; body starts at 4

    bool ok() const { return off <= len; }
    void align(size_t size) {
        size_t rel = off - 4;
        off += (size - (rel % size)) % size;
    }
    uint8_t u8() { return off < len ? buf[off++] : 0; }
    uint16_t u16() {
        align(2);
        uint16_t v = 0;
        if (off + 2 <= len) std::memcpy(&v, buf + off, 2);
        off += 2;
        return v;
    }
    uint32_t u32() {
        align(4);
        uint32_t v = 0;
        if (off + 4 <= len) std::memcpy(&v, buf + off, 4);
        off += 4;
        return v;
    }
    int32_t i32() { return (int32_t)u32(); }
    double f64() {
        align(8);
        double v = 0;
        if (off + 8 <= len) std::memcpy(&v, buf + off, 8);
        off += 8;
        return v;
    }
    void f64n(double* out, size_t n) {
        align(8);
        if (off + 8 * n <= len) std::memcpy(out, buf + off, 8 * n);
        off += 8 * n;
    }
    void skip_string() {
        uint32_t n = u32();
        off += n;
    }
    double header_stamp() {
        int32_t sec = i32();
        uint32_t nsec = u32();
        skip_string();  // frame_id
        return (double)sec + 1e-9 * (double)nsec;
    }
};

inline float read_field_f(const uint8_t* p, uint8_t dt) {
    switch (dt) {
        case 1: return (float)(int8_t)*p;
        case 2: return (float)*p;
        case 3: { int16_t v; std::memcpy(&v, p, 2); return (float)v; }
        case 4: { uint16_t v; std::memcpy(&v, p, 2); return (float)v; }
        case 5: { int32_t v; std::memcpy(&v, p, 4); return (float)v; }
        case 6: { uint32_t v; std::memcpy(&v, p, 4); return (float)v; }
        case 7: { float v; std::memcpy(&v, p, 4); return v; }
        case 8: { double v; std::memcpy(&v, p, 8); return (float)v; }
        default: return 0.f;
    }
}

}  // namespace

extern "C" {

// Decode one PointCloud2 CDR payload. Outputs must be preallocated to
// max_points. Returns the number of points written, or -1 on parse error.
// header_stamp_out receives the message stamp (seconds).
int32_t gcslam_parse_pointcloud2(
    const uint8_t* buf, int64_t len, int64_t max_points,
    float* xyz_out,      // (max_points, 3)
    double* t_out,       // (max_points,)
    int32_t* ring_out,   // (max_points,)
    int32_t* tag_out,    // (max_points,)
    double* header_stamp_out,
    double nonfinite_sentinel) {
    if (len < 8 || buf[1] != 0x01) return -1;  // LE CDR only
    Reader r{buf, (size_t)len, 4};
    *header_stamp_out = r.header_stamp();
    uint32_t height = r.u32();
    uint32_t width = r.u32();
    uint32_t n_fields = r.u32();

    struct F { uint32_t off; uint8_t dt; };
    F fx{0, 0}, fy{0, 0}, fz{0, 0}, fr{0, 0}, ft{0, 0};
    bool has_r = false, has_t = false;
    for (uint32_t i = 0; i < n_fields && r.ok(); ++i) {
        uint32_t nlen = r.u32();
        const char* name = (const char*)(buf + r.off);
        size_t name_len = nlen > 0 ? nlen - 1 : 0;
        r.off += nlen;
        uint32_t foff = r.u32();
        uint8_t dt = r.u8();
        r.u32();  // count
        if (name_len == 1 && name[0] == 'x') fx = {foff, dt};
        else if (name_len == 1 && name[0] == 'y') fy = {foff, dt};
        else if (name_len == 1 && name[0] == 'z') fz = {foff, dt};
        else if (name_len == 4 && !std::strncmp(name, "ring", 4)) { fr = {foff, dt}; has_r = true; }
        else if ((name_len == 1 && name[0] == 't') ||
                 (name_len == 4 && !std::strncmp(name, "time", 4))) { ft = {foff, dt}; has_t = true; }
    }
    r.u8();  // is_bigendian
    uint32_t point_step = r.u32();
    r.u32();  // row_step
    uint32_t data_len = r.u32();
    const uint8_t* data = buf + r.off;
    if (r.off + data_len > (size_t)len) return -1;

    int64_t n = (int64_t)height * (int64_t)width;
    if (n > max_points) n = max_points;
    if ((int64_t)point_step * n > (int64_t)data_len) n = data_len / point_step;

    double t_scale = 1.0;
    // detect ns vs s on the first point
    if (has_t && n > 0) {
        float t0 = read_field_f(data + ft.off, ft.dt);
        if (t0 > 1e6f) t_scale = 1e-9;
    }
    const double sent = nonfinite_sentinel;
    for (int64_t i = 0; i < n; ++i) {
        const uint8_t* p = data + (size_t)i * point_step;
        float vx = read_field_f(p + fx.off, fx.dt);
        float vy = read_field_f(p + fy.off, fy.dt);
        float vz = read_field_f(p + fz.off, fz.dt);
        xyz_out[3 * i + 0] = std::isfinite(vx) ? vx : (float)sent;
        xyz_out[3 * i + 1] = std::isfinite(vy) ? vy : (float)sent;
        xyz_out[3 * i + 2] = std::isfinite(vz) ? vz : (float)sent;
        ring_out[i] = has_r ? (int32_t)read_field_f(p + fr.off, fr.dt) : 0;
        tag_out[i] = 0;
        if (has_t) {
            double tv = (double)read_field_f(p + ft.off, ft.dt) * t_scale;
            t_out[i] = (tv < 1e5) ? tv + *header_stamp_out : tv;
        } else {
            t_out[i] = *header_stamp_out;
        }
    }
    return (int32_t)n;
}

// Decode a batch of Imu CDR payloads (concatenated, with an offsets table).
// Outputs: stamps (n,), gyro (n,3), accel (n,3). Returns n decoded.
int32_t gcslam_parse_imu_batch(
    const uint8_t* blob, const int64_t* offsets, const int64_t* lengths,
    int64_t n_msgs, double* stamps_out, double* gyro_out, double* accel_out) {
    for (int64_t i = 0; i < n_msgs; ++i) {
        Reader r{blob + offsets[i], (size_t)lengths[i], 4};
        stamps_out[i] = r.header_stamp();
        double q[4], cov[9];
        r.f64n(q, 4);
        r.f64n(cov, 9);
        r.f64n(gyro_out + 3 * i, 3);
        r.f64n(cov, 9);
        r.f64n(accel_out + 3 * i, 3);
    }
    return (int32_t)n_msgs;
}

// Decode a batch of Odometry CDR payloads.
// Outputs: stamps (n,), pos (n,3), quat (n,4) xyzw, pose_cov (n,36),
// twist (n,6), twist_cov (n,36).
int32_t gcslam_parse_odometry_batch(
    const uint8_t* blob, const int64_t* offsets, const int64_t* lengths,
    int64_t n_msgs, double* stamps_out, double* pos_out, double* quat_out,
    double* pose_cov_out, double* twist_out, double* twist_cov_out) {
    for (int64_t i = 0; i < n_msgs; ++i) {
        Reader r{blob + offsets[i], (size_t)lengths[i], 4};
        stamps_out[i] = r.header_stamp();
        r.skip_string();  // child_frame_id
        r.f64n(pos_out + 3 * i, 3);
        r.f64n(quat_out + 4 * i, 4);
        r.f64n(pose_cov_out + 36 * i, 36);
        r.f64n(twist_out + 6 * i, 3);      // linear
        r.f64n(twist_out + 6 * i + 3, 3);  // angular
        r.f64n(twist_cov_out + 36 * i, 36);
    }
    return (int32_t)n_msgs;
}

// Deterministic stride point-budget resample with mass preservation
// (reference operators/point_budget.py:51-221), fused with range weighting.
int32_t gcslam_point_budget_range_weights(
    const float* xyz, const double* t, const int32_t* ring, const int32_t* tag,
    int64_t n_in, int64_t n_cap,
    double sigma, double min_r, double max_r, double weight_floor,
    float* xyz_out, double* t_out, float* w_out, int32_t* ring_out, int32_t* tag_out) {
    if (n_in <= 0) return 0;
    int64_t stride = (n_in + n_cap - 1) / n_cap;
    if (stride < 1) stride = 1;

    // total input mass with range weights
    double total_in = 0.0;
    auto range_w = [&](int64_t i) {
        double x = xyz[3 * i], y = xyz[3 * i + 1], z = xyz[3 * i + 2];
        double d = std::sqrt(x * x + y * y + z * z);
        double a = (d - min_r) / sigma, b = (max_r - d) / sigma;
        double w = (1.0 / (1.0 + std::exp(-a))) * (1.0 / (1.0 + std::exp(-b)));
        return w * (1.0 - weight_floor) + weight_floor;
    };
    for (int64_t i = 0; i < n_in; ++i) total_in += range_w(i);

    int64_t k = 0;
    double sel_mass = 0.0;
    for (int64_t i = 0; i < n_in && k < n_cap; i += stride, ++k) sel_mass += range_w(i);
    double scale = total_in / (sel_mass + 1e-12);

    k = 0;
    for (int64_t i = 0; i < n_in && k < n_cap; i += stride, ++k) {
        xyz_out[3 * k] = xyz[3 * i];
        xyz_out[3 * k + 1] = xyz[3 * i + 1];
        xyz_out[3 * k + 2] = xyz[3 * i + 2];
        t_out[k] = t[i];
        w_out[k] = (float)(range_w(i) * scale);
        ring_out[k] = ring[i];
        tag_out[k] = tag[i];
    }
    for (int64_t j = k; j < n_cap; ++j) {
        xyz_out[3 * j] = xyz_out[3 * j + 1] = xyz_out[3 * j + 2] = 0.f;
        t_out[j] = 0.0;
        w_out[j] = 0.f;
        ring_out[j] = 0;
        tag_out[j] = 0;
    }
    return (int32_t)k;
}

}  // extern "C"
