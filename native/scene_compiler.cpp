// Native scene-compiler kernels.
//
// The reference keeps its scene build in C++ (Embree point queries + frame
// math, instancer.cpp:233-390, 640-667).  Our render-time path is on-device
// (XLA/Pallas), so the native home is the host scene compiler: exact
// point-triangle closest-point queries (used for anchor placement and for
// baking per-instance UV Jacobians) and first-hit ray casts (used by the
// numpy oracle/baseline).  Exposed as a plain C ABI for ctypes
// (nerftex_tpu/instancing/native.py); scene.py falls back to numpy when the
// library isn't built.
//
// Build: make -C native     (produces native/libnerftex_native.so)

#include <cmath>
#include <cstdint>
#include <limits>

namespace {

struct Vec3 {
    float x, y, z;
};

inline Vec3 sub(const Vec3& a, const Vec3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline Vec3 add(const Vec3& a, const Vec3& b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline Vec3 scale(const Vec3& a, float s) { return {a.x * s, a.y * s, a.z * s}; }
inline float dot(const Vec3& a, const Vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline Vec3 cross(const Vec3& a, const Vec3& b) {
    return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float norm2(const Vec3& a) { return dot(a, a); }

// Exact point-triangle closest point with barycentric output (the standard
// Voronoi-region walk; same math as instancing/scene.py's vectorized twin).
inline void closest_on_triangle(const Vec3& p, const Vec3& a, const Vec3& b, const Vec3& c,
                                Vec3& out_p, float* bary) {
    const Vec3 ab = sub(b, a), ac = sub(c, a), ap = sub(p, a);
    const float d1 = dot(ab, ap), d2 = dot(ac, ap);
    if (d1 <= 0.f && d2 <= 0.f) { out_p = a; bary[0] = 1; bary[1] = 0; bary[2] = 0; return; }

    const Vec3 bp = sub(p, b);
    const float d3 = dot(ab, bp), d4 = dot(ac, bp);
    if (d3 >= 0.f && d4 <= d3) { out_p = b; bary[0] = 0; bary[1] = 1; bary[2] = 0; return; }

    const Vec3 cp = sub(p, c);
    const float d5 = dot(ab, cp), d6 = dot(ac, cp);
    if (d6 >= 0.f && d5 <= d6) { out_p = c; bary[0] = 0; bary[1] = 0; bary[2] = 1; return; }

    const float vc = d1 * d4 - d3 * d2;
    if (vc <= 0.f && d1 >= 0.f && d3 <= 0.f) {
        const float v = d1 / (d1 - d3);
        out_p = add(a, scale(ab, v));
        bary[0] = 1 - v; bary[1] = v; bary[2] = 0;
        return;
    }

    const float vb = d5 * d2 - d1 * d6;
    if (vb <= 0.f && d2 >= 0.f && d6 <= 0.f) {
        const float v = d2 / (d2 - d6);
        out_p = add(a, scale(ac, v));
        bary[0] = 1 - v; bary[1] = 0; bary[2] = v;
        return;
    }

    const float va = d3 * d6 - d5 * d4;
    if (va <= 0.f && (d4 - d3) >= 0.f && (d5 - d6) >= 0.f) {
        const float v = (d4 - d3) / ((d4 - d3) + (d5 - d6));
        out_p = add(b, scale(sub(c, b), v));
        bary[0] = 0; bary[1] = 1 - v; bary[2] = v;
        return;
    }

    const float denom = 1.f / (va + vb + vc);
    const float v = vb * denom, w = vc * denom;
    out_p = add(a, add(scale(ab, v), scale(ac, w)));
    bary[0] = 1 - v - w; bary[1] = v; bary[2] = w;
}

}  // namespace

extern "C" {

// For each query point: the globally closest triangle + barycentric coords.
// queries [n_query*3], tris as (a, b, c) arrays [n_tris*3] each.
// out_tri [n_query], out_bary [n_query*3], out_dist [n_query].
void nt_closest_points(const float* queries, int64_t n_query,
                       const float* tri_a, const float* tri_b, const float* tri_c,
                       int64_t n_tris,
                       int32_t* out_tri, float* out_bary, float* out_dist) {
    const Vec3* A = reinterpret_cast<const Vec3*>(tri_a);
    const Vec3* B = reinterpret_cast<const Vec3*>(tri_b);
    const Vec3* C = reinterpret_cast<const Vec3*>(tri_c);
    const Vec3* Q = reinterpret_cast<const Vec3*>(queries);

    for (int64_t q = 0; q < n_query; ++q) {
        float best_d2 = std::numeric_limits<float>::infinity();
        int32_t best_tri = 0;
        float best_bary[3] = {1.f, 0.f, 0.f};
        for (int64_t t = 0; t < n_tris; ++t) {
            Vec3 cp;
            float bary[3];
            closest_on_triangle(Q[q], A[t], B[t], C[t], cp, bary);
            const float d2 = norm2(sub(Q[q], cp));
            if (d2 < best_d2) {
                best_d2 = d2;
                best_tri = static_cast<int32_t>(t);
                best_bary[0] = bary[0]; best_bary[1] = bary[1]; best_bary[2] = bary[2];
            }
        }
        out_tri[q] = best_tri;
        out_bary[q * 3 + 0] = best_bary[0];
        out_bary[q * 3 + 1] = best_bary[1];
        out_bary[q * 3 + 2] = best_bary[2];
        out_dist[q] = std::sqrt(best_d2);
    }
}

// First-hit ray casts (Moller-Trumbore) for the host oracle/baseline.
// rays_o/rays_d [n_rays*3]; v0/e1/e2 [n_tris*3]; outputs t (inf on miss),
// tri id, barycentric u/v.
void nt_ray_mesh_first_hit(const float* rays_o, const float* rays_d, int64_t n_rays,
                           const float* v0, const float* e1, const float* e2,
                           int64_t n_tris, float t_max,
                           float* out_t, int32_t* out_tri, float* out_u, float* out_v) {
    const Vec3* O = reinterpret_cast<const Vec3*>(rays_o);
    const Vec3* D = reinterpret_cast<const Vec3*>(rays_d);
    const Vec3* V0 = reinterpret_cast<const Vec3*>(v0);
    const Vec3* E1 = reinterpret_cast<const Vec3*>(e1);
    const Vec3* E2 = reinterpret_cast<const Vec3*>(e2);

    for (int64_t r = 0; r < n_rays; ++r) {
        float best_t = std::numeric_limits<float>::infinity();
        int32_t best_tri = -1;
        float best_u = 0.f, best_v = 0.f;
        for (int64_t t = 0; t < n_tris; ++t) {
            const Vec3 pvec = cross(D[r], E2[t]);
            const float det = dot(E1[t], pvec);
            if (std::fabs(det) < 1e-12f) continue;
            const float inv_det = 1.f / det;
            const Vec3 tvec = sub(O[r], V0[t]);
            const float u = dot(tvec, pvec) * inv_det;
            if (u < 0.f || u > 1.f) continue;
            const Vec3 qvec = cross(tvec, E1[t]);
            const float v = dot(D[r], qvec) * inv_det;
            if (v < 0.f || u + v > 1.f) continue;
            const float hit_t = dot(E2[t], qvec) * inv_det;
            if (hit_t > 1e-6f && hit_t < t_max && hit_t < best_t) {
                best_t = hit_t;
                best_tri = static_cast<int32_t>(t);
                best_u = u;
                best_v = v;
            }
        }
        out_t[r] = best_t;
        out_tri[r] = best_tri;
        out_u[r] = best_u;
        out_v[r] = best_v;
    }
}

}  // extern "C"
