// Native host-side runtime components for uneven_planner_tpu.
//
// The reference implements its whole runtime in C++ (SURVEY.md §2); here the
// TPU compute path is JAX/XLA, and this library provides the host-side
// native pieces around it:
//   - point-cloud data loader: PCD parse + crop box + centroid voxel filter
//     (capability of uneven_map.cpp:127-163, PCL-free)
//   - terrain map cache IO: the reference CSV format (uneven_map.cpp:270-315,
//     400-412) at native speed (the 5M-line hill cache takes minutes in
//     Python, <2s here)
//   - kinodynamic A* with Dubins one-shot: an exact-semantics port of the
//     reference front end (kino_astar.cpp:67-236) used as the golden oracle
//     for the batched TPU search and as a host fallback planner.
//
// Exposed as a C API consumed through ctypes (no pybind11 in this image).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fstream>
#include <queue>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

double mod2pi(double x) {
  double r = std::fmod(x, 2 * kPi);
  return r < 0 ? r + 2 * kPi : r;
}

double norm_so2(double yaw) {
  while (yaw > kPi) yaw -= 2 * kPi;
  while (yaw < -kPi) yaw += 2 * kPi;
  return yaw;
}

// ---------------------------------------------------------------------------
// Dubins shortest paths (same six words as frontend/dubins.py)
// ---------------------------------------------------------------------------

struct DubinsPath {
  double seg[3];   // lengths (turns in radians, straight in rho units)
  int type[3];     // +1 = L, 0 = S, -1 = R
  double total;    // normalized length
  bool ok;
};

void try_word(double t, double p, double q, int a, int b, int c, bool valid,
              DubinsPath* best) {
  if (!valid) return;
  double tot = t + p + q;
  if (tot < best->total) {
    best->seg[0] = t; best->seg[1] = p; best->seg[2] = q;
    best->type[0] = a; best->type[1] = b; best->type[2] = c;
    best->total = tot;
    best->ok = true;
  }
}

DubinsPath dubins_best(double alpha, double beta, double d) {
  DubinsPath best;
  best.total = 1e18;
  best.ok = false;
  double sa = std::sin(alpha), ca = std::cos(alpha);
  double sb = std::sin(beta), cb = std::cos(beta);
  double cab = std::cos(alpha - beta);

  // LSL
  {
    double p2 = 2 + d * d - 2 * cab + 2 * d * (sa - sb);
    if (p2 >= 0) {
      double th = std::atan2(cb - ca, d + sa - sb);
      try_word(mod2pi(-alpha + th), std::sqrt(p2), mod2pi(beta - th),
               1, 0, 1, true, &best);
    }
  }
  // RSR
  {
    double p2 = 2 + d * d - 2 * cab + 2 * d * (sb - sa);
    if (p2 >= 0) {
      double th = std::atan2(ca - cb, d - sa + sb);
      try_word(mod2pi(alpha - th), std::sqrt(p2), mod2pi(-beta + th),
               -1, 0, -1, true, &best);
    }
  }
  // LSR
  {
    double p2 = -2 + d * d + 2 * cab + 2 * d * (sa + sb);
    if (p2 >= 0) {
      double p = std::sqrt(p2);
      double th = std::atan2(-ca - cb, d + sa + sb) - std::atan2(-2.0, p);
      try_word(mod2pi(-alpha + th), p, mod2pi(-mod2pi(beta) + th),
               1, 0, -1, true, &best);
    }
  }
  // RSL
  {
    double p2 = d * d - 2 + 2 * cab - 2 * d * (sa + sb);
    if (p2 >= 0) {
      double p = std::sqrt(p2);
      double th = std::atan2(ca + cb, d - sa - sb) - std::atan2(2.0, p);
      try_word(mod2pi(alpha - th), p, mod2pi(beta - th),
               -1, 0, 1, true, &best);
    }
  }
  // RLR
  {
    double tmp = (6.0 - d * d + 2 * cab + 2 * d * (sa - sb)) / 8.0;
    if (std::fabs(tmp) <= 1.0) {
      double p = mod2pi(2 * kPi - std::acos(tmp));
      double th = alpha - std::atan2(ca - cb, d - sa + sb) + mod2pi(p / 2.0);
      try_word(mod2pi(th), p, mod2pi(alpha - beta - th + mod2pi(p)),
               -1, 1, -1, true, &best);
    }
  }
  // LRL
  {
    double tmp = (6.0 - d * d + 2 * cab + 2 * d * (sb - sa)) / 8.0;
    if (std::fabs(tmp) <= 1.0) {
      double p = mod2pi(2 * kPi - std::acos(tmp));
      double th = -alpha - std::atan2(ca - cb, d + sa - sb) + p / 2.0;
      try_word(mod2pi(th), p, mod2pi(mod2pi(beta) - alpha - th + mod2pi(p)),
               1, -1, 1, true, &best);
    }
  }
  return best;
}

void seg_advance(double pose[3], double len, int type) {
  double x = pose[0], y = pose[1], th = pose[2];
  if (type == 0) {
    pose[0] = x + len * std::cos(th);
    pose[1] = y + len * std::sin(th);
  } else if (type == 1) {
    pose[0] = x + std::sin(th + len) - std::sin(th);
    pose[1] = y - std::cos(th + len) + std::cos(th);
    pose[2] = th + len;
  } else {
    pose[0] = x - std::sin(th - len) + std::sin(th);
    pose[1] = y + std::cos(th - len) - std::cos(th);
    pose[2] = th - len;
  }
}

struct DubinsQuery {
  DubinsPath path;
  double q0[3];
  double rho;
  double length;  // world units
};

DubinsQuery dubins_query(const double q0[3], const double q1[3], double rho) {
  DubinsQuery q;
  double dx = q1[0] - q0[0], dy = q1[1] - q0[1];
  double D = std::sqrt(dx * dx + dy * dy);
  double th = std::atan2(dy, dx);
  q.path = dubins_best(mod2pi(q0[2] - th), mod2pi(q1[2] - th), D / rho);
  std::memcpy(q.q0, q0, 3 * sizeof(double));
  q.rho = rho;
  q.length = q.path.ok ? q.path.total * rho : 1e18;
  return q;
}

void dubins_sample(const DubinsQuery& q, double s, double out[3]) {
  double t = s / q.rho;
  double pose[3] = {0.0, 0.0, q.q0[2]};
  double done = std::min(t, q.path.seg[0]);
  seg_advance(pose, done, q.path.type[0]);
  done = std::max(0.0, std::min(t - q.path.seg[0], q.path.seg[1]));
  seg_advance(pose, done, q.path.type[1]);
  done = std::max(0.0, std::min(t - q.path.seg[0] - q.path.seg[1],
                                q.path.seg[2]));
  seg_advance(pose, done, q.path.type[2]);
  out[0] = q.q0[0] + pose[0] * q.rho;
  out[1] = q.q0[1] + pose[1] * q.rho;
  out[2] = pose[2];
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// PCD loader (ascii + binary), crop box, centroid voxel filter
// Returns point count written into out (xyz interleaved), or -1 on error.
// ---------------------------------------------------------------------------
int pcd_load(const char* path, const double* lo, const double* hi,
             double leaf, double* out, int capacity) {
  std::ifstream f(path, std::ios::binary);
  if (!f.good()) return -1;

  std::string line, data_mode;
  int n_points = 0;
  std::vector<std::string> fields;
  std::vector<int> sizes;
  std::vector<char> types;
  while (std::getline(f, line)) {
    if (line.empty() || line[0] == '#') continue;
    std::istringstream ss(line);
    std::string key;
    ss >> key;
    if (key == "FIELDS") {
      std::string v;
      while (ss >> v) fields.push_back(v);
    } else if (key == "SIZE") {
      int v;
      while (ss >> v) sizes.push_back(v);
    } else if (key == "TYPE") {
      std::string v;
      while (ss >> v) types.push_back(v[0]);
    } else if (key == "POINTS") {
      ss >> n_points;
    } else if (key == "DATA") {
      ss >> data_mode;
      break;
    }
  }
  int stride = 0, off_x = -1, off_y = -1, off_z = -1;
  for (size_t i = 0; i < fields.size(); i++) {
    if (fields[i] == "x") off_x = stride;
    if (fields[i] == "y") off_y = stride;
    if (fields[i] == "z") off_z = stride;
    stride += sizes[i];
  }
  if (off_x < 0 || off_y < 0 || off_z < 0) return -2;

  std::vector<double> pts;
  pts.reserve(3 * n_points);
  if (data_mode == "binary") {
    std::vector<char> buf(size_t(stride) * n_points);
    f.read(buf.data(), buf.size());
    for (int i = 0; i < n_points; i++) {
      const char* p = buf.data() + size_t(i) * stride;
      float x, y, z;
      std::memcpy(&x, p + off_x, 4);
      std::memcpy(&y, p + off_y, 4);
      std::memcpy(&z, p + off_z, 4);
      pts.push_back(x); pts.push_back(y); pts.push_back(z);
    }
  } else {
    int ix = -1, iy = -1, iz = -1, col = 0;
    for (size_t i = 0; i < fields.size(); i++) {
      if (fields[i] == "x") ix = col;
      if (fields[i] == "y") iy = col;
      if (fields[i] == "z") iz = col;
      col++;
    }
    for (int i = 0; i < n_points && std::getline(f, line); i++) {
      std::istringstream ss(line);
      std::vector<double> vals;
      double v;
      while (ss >> v) vals.push_back(v);
      if ((int)vals.size() <= std::max(ix, std::max(iy, iz))) continue;
      pts.push_back(vals[ix]); pts.push_back(vals[iy]); pts.push_back(vals[iz]);
    }
  }

  // crop box
  std::vector<double> crop;
  crop.reserve(pts.size());
  for (size_t i = 0; i + 2 < pts.size(); i += 3) {
    double x = pts[i], y = pts[i + 1], z = pts[i + 2];
    if (x >= lo[0] && x <= hi[0] && y >= lo[1] && y <= hi[1] &&
        z >= lo[2] && z <= hi[2]) {
      crop.push_back(x); crop.push_back(y); crop.push_back(z);
    }
  }

  // centroid voxel filter
  struct Acc { double x = 0, y = 0, z = 0; int n = 0; };
  std::unordered_map<uint64_t, Acc> vox;
  vox.reserve(crop.size() / 3);
  for (size_t i = 0; i + 2 < crop.size(); i += 3) {
    int64_t kx = (int64_t)std::floor(crop[i] / leaf);
    int64_t ky = (int64_t)std::floor(crop[i + 1] / leaf);
    int64_t kz = (int64_t)std::floor(crop[i + 2] / leaf);
    uint64_t key = (uint64_t(kx & 0x1FFFFF) << 42) |
                   (uint64_t(ky & 0x1FFFFF) << 21) | uint64_t(kz & 0x1FFFFF);
    Acc& a = vox[key];
    a.x += crop[i]; a.y += crop[i + 1]; a.z += crop[i + 2]; a.n++;
  }
  int cnt = 0;
  for (auto& kv : vox) {
    if (cnt >= capacity) break;
    out[3 * cnt] = kv.second.x / kv.second.n;
    out[3 * cnt + 1] = kv.second.y / kv.second.n;
    out[3 * cnt + 2] = kv.second.z / kv.second.n;
    cnt++;
  }
  return cnt;
}

// ---------------------------------------------------------------------------
// Reference CSV map cache (x,y,yaw,z,sigma,zb0,zb1 per line)
// ---------------------------------------------------------------------------
int map_csv_read(const char* path, int nx, int ny, int nyaw, double* out) {
  std::ifstream f(path);
  if (!f.good()) return -1;
  std::string line;
  int rows = 0;
  while (std::getline(f, line)) {
    int x, y, w;
    double z, sig, a, b;
    if (std::sscanf(line.c_str(), "%d,%d,%d,%lf,%lf,%lf,%lf",
                    &x, &y, &w, &z, &sig, &a, &b) != 7) continue;
    if (x < 0 || x >= nx || y < 0 || y >= ny || w < 0 || w >= nyaw) continue;
    double* cell = out + (((size_t)x * ny + y) * nyaw + w) * 4;
    cell[0] = z; cell[1] = sig; cell[2] = a; cell[3] = b;
    rows++;
  }
  return rows;
}

int map_csv_write(const char* path, int nx, int ny, int nyaw,
                  const double* data) {
  FILE* f = std::fopen(path, "w");
  if (!f) return -1;
  for (int x = 0; x < nx; x++)
    for (int y = 0; y < ny; y++)
      for (int w = 0; w < nyaw; w++) {
        const double* c = data + (((size_t)x * ny + y) * nyaw + w) * 4;
        std::fprintf(f, "%d,%d,%d,%.17g,%.17g,%.17g,%.17g\n",
                     x, y, w, c[0], c[1], c[2], c[3]);
      }
  std::fclose(f);
  return nx * ny * nyaw;
}

// ---------------------------------------------------------------------------
// Kinodynamic A* (exact reference semantics, kino_astar.cpp:67-236)
// ---------------------------------------------------------------------------

struct KinoParams {
  double origin_x, origin_y;
  double xy_resolution;
  int nx, ny, nyaw_map;       // SE(2) sigma grid dims
  double yaw_map_resolution;  // sigma grid yaw resolution
  double yaw_resolution;      // search yaw bin width (3.15 in reference)
  double lambda_heu, weight_r2, weight_so2, weight_v_change,
      weight_delta_change, weight_sigma;
  double time_interval, collision_interval, oneshot_range;
  double wheel_base, max_steer, max_vel;
  int max_expansions;
};

struct Node {
  double state[3];
  double input[2];
  double g, f;
  int parent;     // node index
  char status;    // 0 not, 1 open, 2 closed
};

}  // extern C (reopened below)

namespace {

struct SigmaGrid {
  const double* data;  // [nx, ny, nyaw] sigma channel
  const KinoParams* p;

  double at(int x, int y, int w) const {
    x = std::max(0, std::min(x, p->nx - 1));
    y = std::max(0, std::min(y, p->ny - 1));
    w = ((w % p->nyaw_map) + p->nyaw_map) % p->nyaw_map;
    return data[((size_t)x * p->ny + y) * p->nyaw_map + w];
  }

  // trilinear with SO(2) yaw (uneven_map.h:154-201, sigma channel)
  double sigma(double px, double py, double yaw) const {
    double yaw_origin = -(kPi + 2.5e-2);
    double mx = px - 0.5 * p->xy_resolution;
    double my = py - 0.5 * p->xy_resolution;
    double mw = norm_so2(yaw - 0.5 * p->yaw_map_resolution);
    int ix = (int)std::floor((mx - p->origin_x) / p->xy_resolution);
    int iy = (int)std::floor((my - p->origin_y) / p->xy_resolution);
    int iw = (int)std::floor((mw - yaw_origin) / p->yaw_map_resolution);
    double cx = (ix + 0.5) * p->xy_resolution + p->origin_x;
    double cy = (iy + 0.5) * p->xy_resolution + p->origin_y;
    double cw = (iw + 0.5) * p->yaw_map_resolution + yaw_origin;
    double dx = (px - cx) / p->xy_resolution;
    double dy = (py - cy) / p->xy_resolution;
    double dw = std::atan2(std::sin(yaw - cw), std::cos(yaw - cw)) /
                p->yaw_map_resolution;
    double v = 0;
    for (int a = 0; a < 2; a++)
      for (int b = 0; b < 2; b++)
        for (int c = 0; c < 2; c++) {
          double wgt = (a ? dx : 1 - dx) * (b ? dy : 1 - dy) *
                       (c ? dw : 1 - dw);
          v += wgt * at(ix + a, iy + b, iw + c);
        }
    return v;
  }
};

void state_transit(const double s0[3], double s1[3], double v, double steer,
                   double T, double wheel_base) {
  double s = v * T;
  double y = s * std::tan(steer) / wheel_base;
  if (std::fabs(steer) > 1e-4) {
    double r = s / y;
    s1[0] = s0[0] + r * (std::sin(s0[2] + y) - std::sin(s0[2]));
    s1[1] = s0[1] - r * (std::cos(s0[2] + y) - std::cos(s0[2]));
    s1[2] = norm_so2(s0[2] + y);
  } else {
    s1[0] = s0[0] + s * std::cos(s0[2]);
    s1[1] = s0[1] + s * std::sin(s0[2]);
    s1[2] = s0[2];
  }
}

}  // namespace

extern "C" {

// occ_xy: [nx, ny] uint8; sigma: [nx, ny, nyaw_map] double.
// out: caller buffer for up to cap poses (x, y, yaw); returns count or
// 0 = no path, negative = error.
int kino_astar_plan(const KinoParams* p, const unsigned char* occ_xy,
                    const double* sigma_data, const double* start,
                    const double* goal, double* out, int cap) {
  SigmaGrid sg{sigma_data, p};
  auto occ = [&](double x, double y) {
    int ix = (int)std::floor((x - p->origin_x) / p->xy_resolution);
    int iy = (int)std::floor((y - p->origin_y) / p->xy_resolution);
    if (ix < 0 || ix >= p->nx || iy < 0 || iy >= p->ny) return true;
    return occ_xy[(size_t)ix * p->ny + iy] != 0;
  };
  if (occ(start[0], start[1]) || occ(goal[0], goal[1])) return -3;

  double rho = p->wheel_base / std::tan(p->max_steer);
  int yaw_bins = std::max(1, (int)std::ceil(2 * kPi / p->yaw_resolution));
  auto cell_of = [&](const double s[3]) -> int64_t {
    int ix = (int)std::floor((s[0] - p->origin_x) / p->xy_resolution);
    int iy = (int)std::floor((s[1] - p->origin_y) / p->xy_resolution);
    int ib = (int)std::floor((norm_so2(s[2]) + kPi) / p->yaw_resolution);
    ib = std::max(0, std::min(ib, yaw_bins - 1));
    return ((int64_t)ix * p->ny + iy) * yaw_bins + ib;
  };
  auto heu = [&](const double s[3]) {
    double dx = s[0] - goal[0], dy = s[1] - goal[1];
    return (1.0 + 1.0 / 10000) * std::sqrt(dx * dx + dy * dy);
  };

  std::vector<Node> nodes;
  nodes.reserve(1 << 16);
  std::unordered_map<int64_t, int> table;
  using QE = std::pair<double, int>;
  std::priority_queue<QE, std::vector<QE>, std::greater<QE>> open;

  Node root;
  root.state[0] = start[0]; root.state[1] = start[1];
  root.state[2] = norm_so2(start[2]);
  root.input[0] = root.input[1] = 0;
  root.g = 0;
  root.f = p->lambda_heu * heu(root.state);
  root.parent = -1;
  root.status = 1;
  nodes.push_back(root);
  table[cell_of(root.state)] = 0;
  open.push({root.f, 0});

  DubinsQuery shot;
  int shot_from = -1;
  int expansions = 0;

  while (!open.empty() && expansions < p->max_expansions) {
    int cur = open.top().second;
    double fcur = open.top().first;
    open.pop();
    if (nodes[cur].status == 2 || fcur > nodes[cur].f + 1e-12) continue;

    // one-shot (kino_astar.cpp:115-127)
    double dxg = nodes[cur].state[0] - goal[0];
    double dyg = nodes[cur].state[1] - goal[1];
    if (std::sqrt(dxg * dxg + dyg * dyg) < p->oneshot_range) {
      DubinsQuery q = dubins_query(nodes[cur].state, goal, rho);
      bool okshot = q.path.ok;
      for (double l = 0.0; okshot && l <= q.length; l += p->collision_interval) {
        double pt[3];
        dubins_sample(q, l, pt);
        if (occ(pt[0], pt[1])) okshot = false;
      }
      if (okshot) {
        shot = q;
        shot_from = cur;
        break;
      }
    }

    nodes[cur].status = 2;
    expansions++;

    for (double v = 0; v <= p->max_vel + 1e-3; v += 0.5 * p->max_vel) {
      for (double steer = -p->max_steer; steer <= p->max_steer + 1e-3;
           steer += 0.5 * p->max_steer) {
        if (v < 1e-9) continue;  // no-op input
        double pro[3];
        state_transit(nodes[cur].state, pro, v, steer, p->time_interval,
                      p->wheel_base);
        if (pro[0] < p->origin_x + 1e-4 || pro[1] < p->origin_y + 1e-4 ||
            pro[0] > p->origin_x + p->nx * p->xy_resolution - 1e-4 ||
            pro[1] > p->origin_y + p->ny * p->xy_resolution - 1e-4)
          continue;

        // arc collision sampling (kino_astar.cpp:171-185)
        double arc = v * p->time_interval;
        double tct = p->collision_interval / arc * p->time_interval;
        bool blocked = false;
        for (double t = tct; t <= p->time_interval + 1e-3; t += tct) {
          double xt[3];
          state_transit(nodes[cur].state, xt, v, steer, t, p->wheel_base);
          if (occ(xt[0], xt[1])) { blocked = true; break; }
        }
        if (blocked) continue;

        double g = nodes[cur].g + p->weight_r2 * arc +
                   p->weight_so2 * std::fabs(steer) * arc +
                   p->weight_v_change * std::fabs(v - nodes[cur].input[0]) +
                   p->weight_delta_change *
                       std::fabs(steer - nodes[cur].input[1]) +
                   p->weight_sigma * sg.sigma(pro[0], pro[1], pro[2]);
        double fsc = g + p->lambda_heu * heu(pro);

        int64_t cell = cell_of(pro);
        auto it = table.find(cell);
        if (it != table.end()) {
          Node& ex = nodes[it->second];
          if (ex.status == 2) continue;
          if (g < ex.g) {
            std::memcpy(ex.state, pro, sizeof pro);
            ex.g = g;
            ex.f = fsc;
            ex.input[0] = v; ex.input[1] = steer;
            ex.parent = cur;
            open.push({fsc, it->second});
          }
        } else {
          Node nn;
          std::memcpy(nn.state, pro, sizeof pro);
          nn.input[0] = v; nn.input[1] = steer;
          nn.g = g; nn.f = fsc;
          nn.parent = cur;
          nn.status = 1;
          nodes.push_back(nn);
          table[cell] = (int)nodes.size() - 1;
          open.push({fsc, (int)nodes.size() - 1});
        }
      }
    }
  }

  if (shot_from < 0) return 0;

  // retrieve (kino_astar.h:273-292): tree part + shot samples + goal
  std::vector<int> chain;
  for (int n = shot_from; n >= 0; n = nodes[n].parent) chain.push_back(n);
  std::reverse(chain.begin(), chain.end());

  int cnt = 0;
  for (int id : chain) {
    if (cnt >= cap) return -4;
    std::memcpy(out + 3 * cnt, nodes[id].state, 3 * sizeof(double));
    cnt++;
  }
  for (double l = p->collision_interval; l < shot.length;
       l += p->collision_interval) {
    if (cnt >= cap) return -4;
    dubins_sample(shot, l, out + 3 * cnt);
    cnt++;
  }
  if (cnt >= cap) return -4;
  std::memcpy(out + 3 * cnt, goal, 3 * sizeof(double));
  cnt++;
  return cnt;
}

double dubins_distance(const double* q0, const double* q1, double rho) {
  return dubins_query(q0, q1, rho).length;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// L3 golden oracle: MINCO generate (block-tridiagonal 6N solve,
// se2traj.hpp:595-680) and the ALM inner cost at a fixed iterate
// (alm_traj_opt.cpp:280-347 innerCallback + :663-991 calConstrainCostGrad,
// forward value).  Freshly written f64 twins of the same math — the
// cross-implementation oracle SURVEY.md §4 requires for the L3 stack; the
// JAX coefficients, cost, and (via central differences on this cost)
// gradient are tested against these in tests/test_native.py.
// ---------------------------------------------------------------------------

namespace {

// Solve A x = b for a 6x6 system, Gaussian elimination w/ partial pivoting.
// A and b are overwritten; x lands in b (ncols right-hand sides).
bool solve6(double A[36], double* b, int ncols) {
  for (int k = 0; k < 6; k++) {
    int p = k;
    for (int i = k + 1; i < 6; i++)
      if (std::fabs(A[6 * i + k]) > std::fabs(A[6 * p + k])) p = i;
    if (std::fabs(A[6 * p + k]) < 1e-300) return false;
    if (p != k) {
      for (int j = 0; j < 6; j++) std::swap(A[6 * p + j], A[6 * k + j]);
      for (int j = 0; j < ncols; j++)
        std::swap(b[ncols * p + j], b[ncols * k + j]);
    }
    for (int i = k + 1; i < 6; i++) {
      double f = A[6 * i + k] / A[6 * k + k];
      A[6 * i + k] = 0.0;
      for (int j = k + 1; j < 6; j++) A[6 * i + j] -= f * A[6 * k + j];
      for (int j = 0; j < ncols; j++)
        b[ncols * i + j] -= f * b[ncols * k + j];
    }
  }
  for (int k = 5; k >= 0; k--) {
    for (int j = 0; j < ncols; j++) {
      double s = b[ncols * k + j];
      for (int i = k + 1; i < 6; i++) s -= A[6 * k + i] * b[ncols * i + j];
      b[ncols * k + j] = s / A[6 * k + k];
    }
  }
  return true;
}

void beta_rows(double t, double b0[6], double b1[6], double b2[6]) {
  double t2 = t * t, t3 = t2 * t, t4 = t3 * t, t5 = t4 * t;
  double v0[6] = {1, t, t2, t3, t4, t5};
  double v1[6] = {0, 1, 2 * t, 3 * t2, 4 * t3, 5 * t4};
  double v2[6] = {0, 0, 2, 6 * t, 12 * t2, 20 * t3};
  std::memcpy(b0, v0, sizeof v0);
  std::memcpy(b1, v1, sizeof v1);
  std::memcpy(b2, v2, sizeof v2);
}

}  // namespace

extern "C" {

// MINCO s=3 generate: block-tridiagonal Thomas over 6x6 blocks.
// inner [(N-1)*dim] row-major, ts [N], head/tail [3*dim] row-major
// (pos; vel; acc).  coeffs_out [N*6*dim] ascending powers.  Returns 0 ok.
int minco_generate(int N, int dim, const double* inner, const double* ts,
                   const double* head, const double* tail,
                   double* coeffs_out) {
  if (N < 2 || dim < 1 || dim > 4) return -1;
  std::vector<double> D(36 * N, 0.0), U(36 * N, 0.0), L(36 * N, 0.0),
      rhs(6 * dim * N, 0.0);
  std::vector<double> b0(6 * N), b1(6 * N), b2(6 * N);
  for (int i = 0; i < N; i++)
    beta_rows(ts[i], &b0[6 * i], &b1[6 * i], &b2[6 * i]);

  // diagonal blocks
  D[0 * 36 + 0 * 6 + 0] = 1.0;
  D[0 * 36 + 1 * 6 + 1] = 1.0;
  D[0 * 36 + 2 * 6 + 2] = 2.0;
  for (int i = 1; i < N; i++) {
    D[i * 36 + 0 * 6 + 0] = -1.0;
    D[i * 36 + 1 * 6 + 1] = -1.0;
    D[i * 36 + 2 * 6 + 2] = -2.0;
  }
  for (int i = 0; i < N - 1; i++) {
    D[i * 36 + 3 * 6 + 3] = 6.0;
    D[i * 36 + 3 * 6 + 4] = 24.0 * ts[i];
    D[i * 36 + 3 * 6 + 5] = 60.0 * ts[i] * ts[i];
    D[i * 36 + 4 * 6 + 4] = 24.0;
    D[i * 36 + 4 * 6 + 5] = 120.0 * ts[i];
    for (int j = 0; j < 6; j++) D[i * 36 + 5 * 6 + j] = b0[6 * i + j];
    // super-diagonal: jerk/snap continuity into next piece
    U[i * 36 + 3 * 6 + 3] = -6.0;
    U[i * 36 + 4 * 6 + 4] = -24.0;
  }
  for (int j = 0; j < 6; j++) {
    D[(N - 1) * 36 + 3 * 6 + j] = b0[6 * (N - 1) + j];
    D[(N - 1) * 36 + 4 * 6 + j] = b1[6 * (N - 1) + j];
    D[(N - 1) * 36 + 5 * 6 + j] = b2[6 * (N - 1) + j];
  }
  // sub-diagonal: pos/vel/acc continuity evaluated at previous piece end
  for (int i = 1; i < N; i++)
    for (int j = 0; j < 6; j++) {
      L[i * 36 + 0 * 6 + j] = b0[6 * (i - 1) + j];
      L[i * 36 + 1 * 6 + j] = b1[6 * (i - 1) + j];
      L[i * 36 + 2 * 6 + j] = b2[6 * (i - 1) + j];
    }
  for (int r = 0; r < 3; r++)
    for (int d = 0; d < dim; d++)
      rhs[0 * 6 * dim + r * dim + d] = head[r * dim + d];
  for (int i = 0; i < N - 1; i++)
    for (int d = 0; d < dim; d++)
      rhs[i * 6 * dim + 5 * dim + d] = inner[i * dim + d];
  for (int r = 0; r < 3; r++)
    for (int d = 0; d < dim; d++)
      rhs[(N - 1) * 6 * dim + (3 + r) * dim + d] = tail[r * dim + d];

  // block-tridiagonal forward elimination (Thomas on 6x6 blocks)
  std::vector<double> Dw(36 * N), Uw(U), rw(rhs);
  std::memcpy(Dw.data(), D.data(), sizeof(double) * 36 * N);
  for (int i = 1; i < N; i++) {
    // factor = L_i * inv(Dw_{i-1}): solve Dw_{i-1}^T y = L_i^T .. simpler:
    // solve Dw_{i-1} X = [U_{i-1} | r_{i-1}] once, then subtract L_i @ X.
    double A[36];
    std::memcpy(A, &Dw[36 * (i - 1)], sizeof A);
    std::vector<double> Bx(6 * (6 + dim));
    for (int r = 0; r < 6; r++) {
      for (int c = 0; c < 6; c++) Bx[r * (6 + dim) + c] = Uw[36 * (i - 1) + r * 6 + c];
      for (int d = 0; d < dim; d++)
        Bx[r * (6 + dim) + 6 + d] = rw[6 * dim * (i - 1) + r * dim + d];
    }
    if (!solve6(A, Bx.data(), 6 + dim)) return -2;
    // Dw_i -= L_i @ X_U ; r_i -= L_i @ X_r
    for (int r = 0; r < 6; r++)
      for (int c = 0; c < 6; c++) {
        double s = 0;
        for (int k = 0; k < 6; k++)
          s += L[36 * i + r * 6 + k] * Bx[k * (6 + dim) + c];
        Dw[36 * i + r * 6 + c] -= s;
      }
    for (int r = 0; r < 6; r++)
      for (int d = 0; d < dim; d++) {
        double s = 0;
        for (int k = 0; k < 6; k++)
          s += L[36 * i + r * 6 + k] * Bx[k * (6 + dim) + 6 + d];
        rw[6 * dim * i + r * dim + d] -= s;
      }
  }
  // back substitution
  std::vector<double> X(6 * dim * N);
  {
    double A[36];
    std::memcpy(A, &Dw[36 * (N - 1)], sizeof A);
    std::vector<double> b(rw.begin() + 6 * dim * (N - 1),
                          rw.begin() + 6 * dim * N);
    if (!solve6(A, b.data(), dim)) return -2;
    std::memcpy(&X[6 * dim * (N - 1)], b.data(), sizeof(double) * 6 * dim);
  }
  for (int i = N - 2; i >= 0; i--) {
    std::vector<double> b(rw.begin() + 6 * dim * i,
                          rw.begin() + 6 * dim * (i + 1));
    for (int r = 0; r < 6; r++)
      for (int d = 0; d < dim; d++) {
        double s = 0;
        for (int k = 0; k < 6; k++)
          s += Uw[36 * i + r * 6 + k] * X[6 * dim * (i + 1) + k * dim + d];
        b[r * dim + d] -= s;
      }
    double A[36];
    std::memcpy(A, &Dw[36 * i], sizeof A);
    if (!solve6(A, b.data(), dim)) return -2;
    std::memcpy(&X[6 * dim * i], b.data(), sizeof(double) * 6 * dim);
  }
  std::memcpy(coeffs_out, X.data(), sizeof(double) * 6 * dim * N);
  return 0;
}

// Closed-form squared-jerk integral of an s=3 MINCO spline
// (se2traj.hpp:697-710).
double minco_jerk_cost(int N, int dim, const double* coeffs,
                       const double* ts) {
  double e = 0;
  for (int i = 0; i < N; i++) {
    const double* c = coeffs + 6 * dim * i;
    double T1 = ts[i], T2 = T1 * T1, T3 = T2 * T1, T4 = T2 * T2,
           T5 = T4 * T1;
    double d33 = 0, d43 = 0, d44 = 0, d53 = 0, d54 = 0, d55 = 0;
    for (int d = 0; d < dim; d++) {
      double c3 = c[3 * dim + d], c4 = c[4 * dim + d], c5 = c[5 * dim + d];
      d33 += c3 * c3; d43 += c4 * c3; d44 += c4 * c4;
      d53 += c5 * c3; d54 += c5 * c4; d55 += c5 * c5;
    }
    e += 36.0 * d33 * T1 + 144.0 * d43 * T2 + 192.0 * d44 * T3 +
         240.0 * d53 * T3 + 720.0 * d54 * T4 + 720.0 * d55 * T5;
  }
  return e;
}

struct InnerCostParams {
  int nxy, nyaw, K;
  double jerk_scale;    // scale_fx * scale_trick_jerk
  double sigma_weight;  // rho_ter * scale_fx
  double time_weight;   // rho_T * scale_fx
  double max_vel, max_acc_lon, max_acc_lat, max_kap, min_cxi, max_sig;
  double delta_sigl, gravity;
  int gnx, gny, gnyaw;
  double origin_x, origin_y, origin_yaw;
  double xy_res, yaw_res;
};

}  // extern C (helpers below)

namespace {

// Trilinear (sigma, zb0, zb1) lookup + 7-tuple terrain variables
// (uneven_map.h:154-201, 221-256; matches terrain/grid.py edge semantics:
// clamped xy, wrapped yaw, out-of-xy-map -> zeros).
void terrain_vars(const InnerCostParams* p, const double* gdata, double px,
                  double py, double yaw, double tv[7]) {
  double v[3] = {0, 0, 0};
  bool inside = px > p->origin_x + 1e-4 &&
                px < p->origin_x + p->gnx * p->xy_res - 1e-4 &&
                py > p->origin_y + 1e-4 &&
                py < p->origin_y + p->gny * p->xy_res - 1e-4;
  if (inside) {
    double mx = px - 0.5 * p->xy_res;
    double my = py - 0.5 * p->xy_res;
    double mw = norm_so2(yaw - 0.5 * p->yaw_res);
    int ix = (int)std::floor((mx - p->origin_x) / p->xy_res);
    int iy = (int)std::floor((my - p->origin_y) / p->xy_res);
    int iw = (int)std::floor((mw - p->origin_yaw) / p->yaw_res);
    double cx = (ix + 0.5) * p->xy_res + p->origin_x;
    double cy = (iy + 0.5) * p->xy_res + p->origin_y;
    double cw = (iw + 0.5) * p->yaw_res + p->origin_yaw;
    double dx = (px - cx) / p->xy_res;
    double dy = (py - cy) / p->xy_res;
    double dw = std::atan2(std::sin(yaw - cw), std::cos(yaw - cw)) /
                p->yaw_res;
    for (int a = 0; a < 2; a++)
      for (int b = 0; b < 2; b++)
        for (int c = 0; c < 2; c++) {
          int xx = std::max(0, std::min(ix + a, p->gnx - 1));
          int yy = std::max(0, std::min(iy + b, p->gny - 1));
          int ww = (((iw + c) % p->gnyaw) + p->gnyaw) % p->gnyaw;
          double wgt = (a ? dx : 1 - dx) * (b ? dy : 1 - dy) *
                       (c ? dw : 1 - dw);
          const double* cell =
              gdata + 4 * (((size_t)xx * p->gny + yy) * p->gnyaw + ww);
          v[0] += wgt * cell[1];
          v[1] += wgt * cell[2];
          v[2] += wgt * cell[3];
        }
  }
  double sig = v[0], zb0 = v[1], zb1 = v[2];
  double c = std::sqrt(std::max(1.0 - zb0 * zb0 - zb1 * zb1, 1e-12));
  double inv_c = 1.0 / c;
  double cy = std::cos(yaw), sy = std::sin(yaw);
  double t = cy * zb0 + sy * zb1;
  double s = sy * zb0 - cy * zb1;
  double sq = std::sqrt(std::max(1.0 - t * t, 1e-12));
  double inv_sq = 1.0 / sq;
  tv[0] = inv_sq;
  tv[1] = -c * t * inv_sq;
  tv[2] = sq * inv_c;
  tv[3] = s * inv_sq;
  tv[4] = c;
  tv[5] = inv_c;
  tv[6] = sig;
}

double expC2(double tau) {
  return tau > 0.0 ? (0.5 * tau + 1.0) * tau + 1.0
                   : 1.0 / ((0.5 * tau - 1.0) * tau + 1.0);
}

}  // namespace

extern "C" {

// ALM inner cost at a fixed iterate (forward value; innerCallback +
// calConstrainCostGrad semantics as realized by solver/alm.py).
//   x [1 + 2*(nxy-1) + (nyaw-1)], head/tail_xy [3*2], head/tail_yaw [3],
//   lam [S], mu [6*S] (channel-major), scale_cx [7*S], gdata
//   [gnx*gny*gnyaw*4].  Returns the scalar cost (NaN on error).
double minco_inner_cost(const InnerCostParams* p, const double* gdata,
                        const double* x, const double* head_xy,
                        const double* tail_xy, const double* head_yaw,
                        const double* tail_yaw, const double* lam,
                        const double* mu, double rho,
                        const double* scale_cx) {
  int N = p->nxy, NY = p->nyaw, K = p->K;
  int S = N * (K + 1);
  double tau = x[0];
  double T = expC2(tau);
  double Tp_xy = T / N, Tp_yaw = T / NY;

  std::vector<double> ts_xy(N, Tp_xy), ts_yaw(NY, Tp_yaw);
  std::vector<double> cxy(6 * 2 * N), cyaw(6 * 1 * NY);
  if (minco_generate(N, 2, x + 1, ts_xy.data(), head_xy, tail_xy,
                     cxy.data()) != 0)
    return std::nan("");
  if (minco_generate(NY, 1, x + 1 + 2 * (N - 1), ts_yaw.data(), head_yaw,
                     tail_yaw, cyaw.data()) != 0)
    return std::nan("");

  double jerk = minco_jerk_cost(N, 2, cxy.data(), ts_xy.data()) +
                minco_jerk_cost(NY, 1, cyaw.data(), ts_yaw.data());

  double cost = p->jerk_scale * jerk + p->time_weight * T;
  double step = Tp_xy / K;

  for (int i = 0; i < N; i++) {
    for (int j = 0; j <= K; j++) {
      int s_idx = i * (K + 1) + j;
      double u = (double)j / K;
      double tl = u * Tp_xy;
      const double* c = &cxy[6 * 2 * i];
      double pos[2] = {0, 0}, vel[2] = {0, 0}, acc[2] = {0, 0};
      double b0[6], b1[6], b2[6];
      beta_rows(tl, b0, b1, b2);
      for (int k = 0; k < 6; k++)
        for (int d = 0; d < 2; d++) {
          pos[d] += b0[k] * c[k * 2 + d];
          vel[d] += b1[k] * c[k * 2 + d];
          acc[d] += b2[k] * c[k * 2 + d];
        }
      // yaw piece located by global time, same arithmetic as
      // minco/uniform.sample_plan (the static fold of
      // alm_traj_opt.cpp:747-764)
      double g = (i + u) * ((double)NY / N);
      int l = std::min((int)std::floor(g + 1e-12), NY - 1);
      double tly = (g - l) * Tp_yaw;
      double y0[6], y1[6], y2[6];
      beta_rows(tly, y0, y1, y2);
      double yaw = 0, dyaw = 0;
      for (int k = 0; k < 6; k++) {
        yaw += y0[k] * cyaw[6 * l + k];
        dyaw += y1[k] * cyaw[6 * l + k];
      }

      double tv[7];
      terrain_vars(p, gdata, pos[0], pos[1], norm_so2(yaw), tv);
      double cyw = std::cos(yaw), syw = std::sin(yaw);
      double v_norm =
          std::sqrt(std::max(vel[0] * vel[0] + vel[1] * vel[1], 1e-24));
      double lon = acc[0] * cyw + acc[1] * syw;
      double lat = -acc[0] * syw + acc[1] * cyw;
      double vx = v_norm * tv[0];
      double wz = dyaw * tv[5];
      double ax = lon * tv[0] + p->gravity * tv[1];
      double ay = lat * tv[2] + p->gravity * tv[3];
      double curv = wz * wz / (vx * vx + p->delta_sigl);
      double nonh = vel[0] * syw - vel[1] * cyw;

      double w = (j == 0 || j == K) ? 0.5 : 1.0;
      cost += p->sigma_weight * step * w * tv[6] * tv[6];

      double h = nonh * scale_cx[0 * S + s_idx];
      cost += h * (lam[s_idx] + 0.5 * rho * h);

      double graw[6] = {vx * vx - p->max_vel * p->max_vel,
                        ax * ax - p->max_acc_lon * p->max_acc_lon,
                        ay * ay - p->max_acc_lat * p->max_acc_lat,
                        curv - p->max_kap * p->max_kap,
                        p->min_cxi - tv[4],
                        tv[6] - p->max_sig};
      for (int cch = 0; cch < 6; cch++) {
        double gc = graw[cch] * scale_cx[(1 + cch) * S + s_idx];
        double m = mu[cch * S + s_idx];
        if (rho * gc + m > 0)
          cost += gc * (m + 0.5 * rho * gc);
        else
          cost += -0.5 * m * m / rho;
      }
    }
  }
  return cost;
}

}  // extern "C"
