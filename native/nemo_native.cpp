// nemo_native: CPU-native kernels for the nemo_tpu runtime.
//
// Counterpart of the reference's only native component — the brute-force
// chamfer-distance CUDA extension (humor/humor/utils/chamfer_distance/) —
// plus a batch OpenPose-JSON keypoint parser for the data-loading path
// (the Python json module is the preprocessing bottleneck at thousands of
// frames per action).
//
// Exposed through a plain C ABI and loaded via ctypes (no pybind11).

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <limits>
#include <string>
#include <vector>

extern "C" {

// ---------------------------------------------------------------------------
// chamfer: one-way nearest-neighbor (squared distance + index) and backward
// ---------------------------------------------------------------------------

// For each point in a (n, 3), find the closest point in b (m, 3).
void chamfer_forward(const float* a, const float* b, int64_t n, int64_t m,
                     float* dist_out, int32_t* idx_out) {
  for (int64_t i = 0; i < n; ++i) {
    const float ax = a[i * 3], ay = a[i * 3 + 1], az = a[i * 3 + 2];
    float best = std::numeric_limits<float>::infinity();
    int32_t best_j = 0;
    for (int64_t j = 0; j < m; ++j) {
      const float dx = ax - b[j * 3];
      const float dy = ay - b[j * 3 + 1];
      const float dz = az - b[j * 3 + 2];
      const float d = dx * dx + dy * dy + dz * dz;
      if (d < best) {
        best = d;
        best_j = static_cast<int32_t>(j);
      }
    }
    dist_out[i] = best;
    idx_out[i] = best_j;
  }
}

// grad wrt a and (scattered) wrt b for d_i = ||a_i - b_{idx_i}||^2.
void chamfer_backward(const float* a, const float* b, const int32_t* idx,
                      const float* grad_dist, int64_t n,
                      float* grad_a, float* grad_b) {
  for (int64_t i = 0; i < n; ++i) {
    const int64_t j = idx[i];
    for (int k = 0; k < 3; ++k) {
      const float diff = 2.0f * (a[i * 3 + k] - b[j * 3 + k]) * grad_dist[i];
      grad_a[i * 3 + k] += diff;
      grad_b[j * 3 + k] -= diff;
    }
  }
}

// ---------------------------------------------------------------------------
// OpenPose JSON batch parser
// ---------------------------------------------------------------------------
//
// Minimal purpose-built scanner: finds `"pose_keypoints_2d":[...]` of the
// requested person and fills 25*3 floats. Not a general JSON parser — the
// OpenPose writer emits a fixed schema.

static int parse_keypoints(const char* text, int person, float* out75) {
  const char* key = "\"pose_keypoints_2d\"";
  const char* p = text;
  for (int occurrence = 0;; ++occurrence) {
    p = strstr(p, key);
    if (!p) return occurrence;  // fewer people than requested
    p = strchr(p, '[');
    if (!p) return -1;
    ++p;
    if (occurrence == person) {
      for (int k = 0; k < 75; ++k) {
        char* end = nullptr;
        out75[k] = strtof(p, &end);
        if (end == p) return -1;
        p = end;
        while (*p == ',' || *p == ' ' || *p == '\n') ++p;
      }
      return occurrence + 1;
    }
  }
}

// Parse `count` files (NUL-separated path list); output (count, 25, 3).
// Missing/empty frames yield zeros. Returns number parsed successfully.
int64_t parse_openpose_batch(const char* paths, int64_t count, int person,
                             float* out) {
  const char* p = paths;
  int64_t ok = 0;
  std::vector<char> buf;
  for (int64_t i = 0; i < count; ++i) {
    float* frame = out + i * 75;
    memset(frame, 0, 75 * sizeof(float));
    FILE* f = fopen(p, "rb");
    if (f) {
      fseek(f, 0, SEEK_END);
      long sz = ftell(f);
      fseek(f, 0, SEEK_SET);
      buf.resize(sz + 1);
      if (fread(buf.data(), 1, sz, f) == static_cast<size_t>(sz)) {
        buf[sz] = '\0';
        if (parse_keypoints(buf.data(), person, frame) > person) ++ok;
        else memset(frame, 0, 75 * sizeof(float));
      }
      fclose(f);
    }
    p += strlen(p) + 1;
  }
  return ok;
}

}  // extern "C"
