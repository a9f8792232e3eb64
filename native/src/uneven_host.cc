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
