// Native host-side runtime for solver2d-tpu: the scene compiler.
//
// The TPU compute path is JAX/XLA; this C++ module is the native runtime
// around it — the analog of the reference's C construction layer
// (reference: src/body.c:152-218 mass accumulation, src/geometry.c:117-286
// shape mass properties, src/hull.c quickhull, src/shape.c:48-67 proxy AABBs).
// Building a 100x100 joint grid or a 5050-box pyramid is tens of thousands of
// small geometric computations; doing them in C++ over flat arrays keeps
// scene freeze() off the Python interpreter's critical path.
//
// Plain C ABI (called via ctypes). All shapes use the unified rounded-polygon
// representation: verts[8][2] padded, count in {1..8}, radius.

#include <cmath>
#include <cstdint>
#include <cstring>

namespace {

constexpr int kMaxVerts = 8;
constexpr float kPi = 3.14159265359f;

struct Vec2 {
  float x, y;
};

static inline Vec2 sub(Vec2 a, Vec2 b) { return {a.x - b.x, a.y - b.y}; }
static inline float dot(Vec2 a, Vec2 b) { return a.x * b.x + a.y * b.y; }
static inline float cross(Vec2 a, Vec2 b) { return a.x * b.y - a.y * b.x; }

}  // namespace

extern "C" {

// Mass properties of one unified shape about the shape-local origin
// (reference: src/geometry.c:117-286, including the radius push-out).
void s2n_shape_mass(const float* verts8, const float* normals8, int count,
                    float radius, float density, float* out_mass,
                    float* out_center, float* out_inertia) {
  const Vec2* v = reinterpret_cast<const Vec2*>(verts8);
  const Vec2* n = reinterpret_cast<const Vec2*>(normals8);

  if (count == 1) {  // circle
    float rr = radius * radius;
    float mass = density * kPi * rr;
    *out_mass = mass;
    out_center[0] = v[0].x;
    out_center[1] = v[0].y;
    *out_inertia = mass * (0.5f * rr + dot(v[0], v[0]));
    return;
  }
  if (count == 2) {  // capsule
    float rr = radius * radius;
    Vec2 d = sub(v[1], v[0]);
    float length = std::sqrt(dot(d, d));
    float ll = length * length;
    float mass = density * (kPi * radius + 2.0f * length) * radius;
    *out_mass = mass;
    out_center[0] = 0.5f * (v[0].x + v[1].x);
    out_center[1] = 0.5f * (v[0].y + v[1].y);
    float circle_i = 0.5f * (rr + ll);
    float box_i = (4.0f * rr + ll) / 12.0f;
    *out_inertia = mass * (circle_i + box_i);
    return;
  }

  Vec2 pts[kMaxVerts];
  if (radius > 0.0f) {
    // push out vertices along corner bisectors (geometry.c:203-225)
    for (int i = 0; i < count; ++i) {
      int j = (i == 0) ? count - 1 : i - 1;
      Vec2 n1 = n[j], n2 = n[i];
      Vec2 mid = {n1.x + n2.x, n1.y + n2.y};
      float ml = std::sqrt(dot(mid, mid));
      if (ml > 1e-12f) {
        mid.x /= ml;
        mid.y /= ml;
      }
      Vec2 t1 = {-n1.y, n1.x};
      float sin_half = cross(mid, t1);
      float offset = (sin_half > 1.1920929e-07f) ? radius / sin_half : radius;
      pts[i] = {v[i].x + offset * mid.x, v[i].y + offset * mid.y};
    }
  } else {
    std::memcpy(pts, v, sizeof(Vec2) * count);
  }

  Vec2 center = {0.0f, 0.0f};
  float area = 0.0f;
  float inertia = 0.0f;
  Vec2 r = pts[0];
  const float inv3 = 1.0f / 3.0f;
  for (int i = 1; i < count - 1; ++i) {
    Vec2 e1 = sub(pts[i], r);
    Vec2 e2 = sub(pts[i + 1], r);
    float D = cross(e1, e2);
    float tri = 0.5f * D;
    area += tri;
    center.x += tri * inv3 * (e1.x + e2.x);
    center.y += tri * inv3 * (e1.y + e2.y);
    float intx2 = e1.x * e1.x + e2.x * e1.x + e2.x * e2.x;
    float inty2 = e1.y * e1.y + e2.y * e1.y + e2.y * e2.y;
    inertia += (0.25f * inv3 * D) * (intx2 + inty2);
  }
  float mass = density * area;
  float inv_area = area > 1e-12f ? 1.0f / area : 0.0f;
  center.x *= inv_area;
  center.y *= inv_area;
  Vec2 world_center = {r.x + center.x, r.y + center.y};
  inertia *= density;
  inertia += mass * (dot(world_center, world_center) - dot(center, center));
  *out_mass = mass;
  out_center[0] = world_center.x;
  out_center[1] = world_center.y;
  *out_inertia = inertia;
}

// Batched scene compilation: per-body mass accumulation with parallel-axis
// shift (reference: src/body.c:152-218) and per-shape world AABB + fat AABB
// (reference: src/shape.c:48-67). Inputs are flat SoA arrays.
//
// n_shapes shapes with: verts [n,8,2], normals [n,8,2], counts [n],
// radii [n], densities [n], body index [n].
// n_bodies bodies with: origin [n,2], angle [n], type [n] (0/1/2).
// Outputs: body mass/inv_mass/inertia/inv_inertia/local_center[2],
// shape aabb [n,4], fat_aabb [n,4].
void s2n_compile_scene(int n_shapes, const float* verts, const float* normals,
                       const int32_t* counts, const float* radii,
                       const float* densities, const int32_t* shape_body,
                       int n_bodies, const float* body_origin,
                       const float* body_angle, const int32_t* body_type,
                       float speculative, float aabb_margin,
                       float* out_mass, float* out_inv_mass, float* out_inertia,
                       float* out_inv_inertia, float* out_local_center,
                       float* out_aabb, float* out_fat_aabb) {
  // zero body accumulators
  for (int b = 0; b < n_bodies; ++b) {
    out_mass[b] = 0.0f;
    out_inertia[b] = 0.0f;
    out_local_center[2 * b] = 0.0f;
    out_local_center[2 * b + 1] = 0.0f;
  }

  // accumulate shape masses into bodies (dynamic only)
  for (int s = 0; s < n_shapes; ++s) {
    int b = shape_body[s];
    if (b < 0 || body_type[b] != 2 || densities[s] == 0.0f) continue;
    float m, c[2], I;
    s2n_shape_mass(verts + 16 * s, normals + 16 * s, counts[s], radii[s],
                   densities[s], &m, c, &I);
    out_mass[b] += m;
    out_local_center[2 * b] += m * c[0];
    out_local_center[2 * b + 1] += m * c[1];
    out_inertia[b] += I;
  }

  for (int b = 0; b < n_bodies; ++b) {
    float m = out_mass[b];
    if (m > 0.0f) {
      out_inv_mass[b] = 1.0f / m;
      out_local_center[2 * b] *= out_inv_mass[b];
      out_local_center[2 * b + 1] *= out_inv_mass[b];
    } else {
      out_inv_mass[b] = 0.0f;
    }
    float cc = out_local_center[2 * b] * out_local_center[2 * b] +
               out_local_center[2 * b + 1] * out_local_center[2 * b + 1];
    float I = out_inertia[b] - m * cc;
    if (I > 0.0f) {
      out_inertia[b] = I;
      out_inv_inertia[b] = 1.0f / I;
    } else {
      out_inertia[b] = 0.0f;
      out_inv_inertia[b] = 0.0f;
    }
  }

  // world AABBs + fat AABBs
  for (int s = 0; s < n_shapes; ++s) {
    int b = shape_body[s];
    float lox = 1e30f, loy = 1e30f, hix = -1e30f, hiy = -1e30f;
    if (b >= 0) {
      float sn = std::sin(body_angle[b]);
      float cs = std::cos(body_angle[b]);
      float ox = body_origin[2 * b], oy = body_origin[2 * b + 1];
      int cnt = counts[s] < 1 ? 1 : counts[s];
      for (int i = 0; i < cnt; ++i) {
        float vx = verts[16 * s + 2 * i];
        float vy = verts[16 * s + 2 * i + 1];
        float wx = cs * vx - sn * vy + ox;
        float wy = sn * vx + cs * vy + oy;
        lox = wx < lox ? wx : lox;
        loy = wy < loy ? wy : loy;
        hix = wx > hix ? wx : hix;
        hiy = wy > hiy ? wy : hiy;
      }
      float r = radii[s] + speculative;
      lox -= r;
      loy -= r;
      hix += r;
      hiy += r;
    } else {
      lox = loy = hix = hiy = 0.0f;
    }
    out_aabb[4 * s] = lox;
    out_aabb[4 * s + 1] = loy;
    out_aabb[4 * s + 2] = hix;
    out_aabb[4 * s + 3] = hiy;
    // smaller margin for statics (shape.c:58)
    float margin = (b >= 0 && body_type[b] == 0) ? 0.0f : aabb_margin;
    out_fat_aabb[4 * s] = lox - margin;
    out_fat_aabb[4 * s + 1] = loy - margin;
    out_fat_aabb[4 * s + 2] = hix + margin;
    out_fat_aabb[4 * s + 3] = hiy + margin;
  }
}

}  // extern "C"
