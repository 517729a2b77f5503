// Native host-side mesh builders for cudaparticlesfoam_tpu.
//
// The reference's tet decomposition runs inside OpenFOAM's C++
// (polyMeshTetDecomposition::findSharedBasePoint / cellTetIndices,
// consumed at src/initCuda.H:86-110); this is the TPU build's native
// equivalent for the quality-driven base-point search — the single
// hottest host step of a cold case load (91 s of numpy temporaries at
// the TJunction coupled scale, 248k cells / 744k quad faces).  Per-face
// work is independent: OpenMP over faces, zero allocations.
//
// The arithmetic mirrors io/polymesh.py::_tet_quality expression for
// expression (same association order, f64 throughout) so the chosen
// base indices agree with the numpy reference implementation.
//
// Build: g++ -O3 -ffp-contract=off -fopenmp -shared -fPIC meshbuild.cpp -o libmeshbuild.so
// (-ffp-contract=off: FMA contraction would change results in the last
//  ulp vs the numpy reference implementation, flipping near-tied argmax)

#include <cstdint>
#include <cmath>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

struct V3 { double x, y, z; };

static inline V3 sub(const V3& a, const V3& b) {
    return {a.x - b.x, a.y - b.y, a.z - b.z};
}

static inline V3 cross(const V3& a, const V3& b) {
    return {a.y * b.z - a.z * b.y,
            a.z * b.x - a.x * b.z,
            a.x * b.y - a.y * b.x};
}

static inline double dot(const V3& a, const V3& b) {
    return a.x * b.x + a.y * b.y + a.z * b.z;
}

// OpenFOAM tetrahedron::quality(): signed volume over the volume of the
// regular tet sharing the circumsphere (polymesh.py:394-419).
static inline double tet_quality(const V3& apex, const V3& p0,
                                 const V3& p1, const V3& p2) {
    V3 e1 = sub(p0, apex);
    V3 e2 = sub(p1, apex);
    V3 e3 = sub(p2, apex);
    V3 c23 = cross(e2, e3);
    double det = dot(e1, c23);
    double vol = det / 6.0;
    double r1 = 0.5 * dot(e1, e1);
    double r2 = 0.5 * dot(e2, e2);
    double r3 = 0.5 * dot(e3, e3);
    V3 c31 = cross(e3, e1);
    V3 c12 = cross(e1, e2);
    double safe_det = (std::fabs(det) > 1e-300) ? det : 1e-300;
    V3 u = {(r1 * c23.x + r2 * c31.x + r3 * c12.x) / safe_det,
            (r1 * c23.y + r2 * c31.y + r3 * c12.y) / safe_det,
            (r1 * c23.z + r2 * c31.z + r3 * c12.z) / safe_det};
    double rc = std::sqrt(dot(u, u));
    if (!(std::fabs(det) > 1e-300)) rc = 1e30;
    if (rc > 1e30) rc = 1e30;
    // std::pow, NOT rc*rc*rc: numpy's rc**3 goes through libm pow and the
    // two differ in the last ulp for ~26% of inputs — enough to flip
    // argmax on the near-tied candidates of regular cells
    return vol / (8.0 / (9.0 * std::sqrt(3.0)) * std::pow(rc, 3.0) + 1e-300);
}

static inline V3 pt(const double* arr, int64_t i) {
    return {arr[3 * i], arr[3 * i + 1], arr[3 * i + 2]};
}

}  // namespace

extern "C" {

// Quality-driven per-face tet base point
// (polyMeshTetDecomposition::findSharedBasePoint semantics, the numpy
// reference being polymesh.py::face_base_points): for each face, pick
// the vertex whose fan maximizes the MINIMUM tet quality over both
// adjacent cells (owner only at boundaries).  Triangles keep base 0.
// First-maximum tie-breaking matches np.argmax.
void face_base_points(
    const double* points,        // [n_pts, 3]
    const int64_t* face_verts,   // flat vertex list
    const int64_t* face_offsets, // [nf + 1]
    const int64_t* owner,        // [nf]
    const int64_t* neighbour,    // [n_int]
    const double* cell_ctrs,     // [nc, 3]
    int64_t nf, int64_t n_int,
    int64_t* base_out)           // [nf]
{
#pragma omp parallel for schedule(dynamic, 512)
    for (int64_t f = 0; f < nf; ++f) {
        int64_t o = face_offsets[f];
        int64_t k = face_offsets[f + 1] - o;
        if (k <= 3) { base_out[f] = 0; continue; }
        V3 cc_own = pt(cell_ctrs, owner[f]);
        bool has_nei = f < n_int;
        V3 cc_nei = has_nei ? pt(cell_ctrs, neighbour[f]) : V3{0, 0, 0};
        double best_q = -1e300;
        int64_t best_c = 0;
        for (int64_t c = 0; c < k; ++c) {
            V3 b = pt(points, face_verts[o + c]);
            double q = 1e300;
            for (int64_t i = 1; i + 1 < k; ++i) {
                V3 pa = pt(points, face_verts[o + (c + i) % k]);
                V3 pb = pt(points, face_verts[o + (c + i + 1) % k]);
                double qo = tet_quality(cc_own, b, pa, pb);
                if (qo < q) q = qo;
                if (has_nei) {
                    // neighbour side sees the face reversed: swap the fan
                    double qn = tet_quality(cc_nei, b, pb, pa);
                    if (qn < q) q = qn;
                }
            }
            if (q > best_q) { best_q = q; best_c = c; }
        }
        base_out[f] = best_c;
    }
}

// Face centres and areas, OpenFOAM's two-pass scheme
// (primitiveMeshFaceCentresAndAreas: estimated centre -> triangle fan
// centroid weighted by triangle area; polymesh.py::face_centres_areas).
void face_centres_areas(
    const double* points,
    const int64_t* face_verts,
    const int64_t* face_offsets,
    int64_t nf,
    double* ctrs,                // [nf, 3] out
    double* areas)               // [nf, 3] out (area normal vectors)
{
#pragma omp parallel for schedule(dynamic, 512)
    for (int64_t f = 0; f < nf; ++f) {
        int64_t o = face_offsets[f];
        int64_t k = face_offsets[f + 1] - o;
        if (k == 3) {
            V3 p0 = pt(points, face_verts[o]);
            V3 p1 = pt(points, face_verts[o + 1]);
            V3 p2 = pt(points, face_verts[o + 2]);
            ctrs[3 * f]     = (p0.x + p1.x + p2.x) / 3.0;
            ctrs[3 * f + 1] = (p0.y + p1.y + p2.y) / 3.0;
            ctrs[3 * f + 2] = (p0.z + p1.z + p2.z) / 3.0;
            V3 n = cross(sub(p1, p0), sub(p2, p0));
            areas[3 * f]     = 0.5 * n.x;
            areas[3 * f + 1] = 0.5 * n.y;
            areas[3 * f + 2] = 0.5 * n.z;
            continue;
        }
        V3 est = {0, 0, 0};
        for (int64_t i = 0; i < k; ++i) {
            V3 p = pt(points, face_verts[o + i]);
            est.x += p.x; est.y += p.y; est.z += p.z;
        }
        est.x /= k; est.y /= k; est.z /= k;
        // mirror polymesh.py:333-346: c = p + p_next + c_est (undivided),
        // centre = sum(a*c) / (3 * sum a) — same association order
        V3 sum_n = {0, 0, 0};
        V3 sum_ac = {0, 0, 0};
        double sum_a = 0.0;
        for (int64_t i = 0; i < k; ++i) {
            V3 p1 = pt(points, face_verts[o + i]);
            V3 p2 = pt(points, face_verts[o + (i + 1) % k]);
            V3 n = cross(sub(p2, p1), sub(est, p1));
            double a = std::sqrt(dot(n, n));
            V3 c = {p1.x + p2.x + est.x,
                    p1.y + p2.y + est.y,
                    p1.z + p2.z + est.z};
            sum_n.x += n.x; sum_n.y += n.y; sum_n.z += n.z;
            sum_ac.x += a * c.x; sum_ac.y += a * c.y; sum_ac.z += a * c.z;
            sum_a += a;
        }
        if (sum_a > 1e-300) {
            double denom = 3.0 * (sum_a > 1e-300 ? sum_a : 1e-300);
            ctrs[3 * f]     = sum_ac.x / denom;
            ctrs[3 * f + 1] = sum_ac.y / denom;
            ctrs[3 * f + 2] = sum_ac.z / denom;
        } else {
            ctrs[3 * f] = est.x; ctrs[3 * f + 1] = est.y; ctrs[3 * f + 2] = est.z;
        }
        areas[3 * f]     = 0.5 * sum_n.x;
        areas[3 * f + 1] = 0.5 * sum_n.y;
        areas[3 * f + 2] = 0.5 * sum_n.z;
    }
}

}  // extern "C"
