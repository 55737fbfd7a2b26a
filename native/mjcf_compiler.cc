// Native MJCF model compiler for ilqg_mujoco_tpu.
//
// The reference's model loader is native C behind -lmujoco (mj_loadXML,
// /root/reference/cmd/basic.cpp:123, Makefile:19).  This is its TPU-framework
// equivalent: a dependency-free C++17 compiler from the MJCF subset used by
// the reference assets to the flat array layout of
// ilqg_mujoco_tpu.physics.model.Model.  Exposed through a C ABI consumed by
// ctypes (ilqg_mujoco_tpu/physics/mjcf_native.py); semantics are kept
// bit-identical to the Python compiler (mjcf.py), enforced by
// tests/test_native_loader.py.
//
// Build: make -C native   (produces libilqg_mjcf.so)

#include <algorithm>
#include <array>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// minimal XML parser (elements, attributes, comments, self-closing tags)
// ---------------------------------------------------------------------------

struct XmlNode {
  std::string tag;
  std::map<std::string, std::string> attrs;
  std::vector<std::unique_ptr<XmlNode>> children;

  const std::string* attr(const std::string& k) const {
    auto it = attrs.find(k);
    return it == attrs.end() ? nullptr : &it->second;
  }
  const XmlNode* child(const std::string& t) const {
    for (auto& c : children)
      if (c->tag == t) return c.get();
    return nullptr;
  }
};

struct XmlParser {
  const char* p;
  const char* end;
  std::string error;

  explicit XmlParser(const std::string& s) : p(s.data()), end(s.data() + s.size()) {}

  void skip_ws() {
    while (p < end && (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) ++p;
  }
  bool starts(const char* s) {
    size_t n = strlen(s);
    return size_t(end - p) >= n && memcmp(p, s, n) == 0;
  }
  void skip_misc() {  // comments, PIs, doctype, text
    for (;;) {
      skip_ws();
      if (starts("<!--")) {
        const char* q = strstr(p + 4, "-->");
        if (!q) { p = end; return; }
        p = q + 3;
      } else if (starts("<?")) {
        const char* q = strstr(p + 2, "?>");
        if (!q) { p = end; return; }
        p = q + 2;
      } else if (starts("<!")) {
        while (p < end && *p != '>') ++p;
        if (p < end) ++p;
      } else if (p < end && *p != '<') {
        ++p;  // stray text
      } else {
        return;
      }
    }
  }

  std::unique_ptr<XmlNode> parse_element() {
    skip_misc();
    if (p >= end || *p != '<') { error = "expected element"; return nullptr; }
    ++p;
    auto node = std::make_unique<XmlNode>();
    while (p < end && !strchr(" \t\n\r/>", *p)) node->tag += *p++;
    // attributes
    for (;;) {
      skip_ws();
      if (p >= end) { error = "unexpected eof"; return nullptr; }
      if (*p == '/') {
        ++p;
        if (p < end && *p == '>') { ++p; return node; }
        error = "bad self-close";
        return nullptr;
      }
      if (*p == '>') { ++p; break; }
      std::string key;
      while (p < end && !strchr("= \t\n\r", *p)) key += *p++;
      skip_ws();
      if (p < end && *p == '=') ++p;
      skip_ws();
      if (p >= end || (*p != '"' && *p != '\'')) { error = "bad attr"; return nullptr; }
      char quote = *p++;
      std::string val;
      while (p < end && *p != quote) val += *p++;
      if (p < end) ++p;
      node->attrs[key] = val;
    }
    // children until closing tag
    for (;;) {
      skip_misc();
      if (p >= end) { error = "missing close for " + node->tag; return nullptr; }
      if (starts("</")) {
        p += 2;
        while (p < end && *p != '>') ++p;
        if (p < end) ++p;
        return node;
      }
      auto child = parse_element();
      if (!child) return nullptr;
      node->children.push_back(std::move(child));
    }
  }
};

// ---------------------------------------------------------------------------
// small math
// ---------------------------------------------------------------------------

using V3 = std::array<double, 3>;
using V4 = std::array<double, 4>;

double fnum(const std::string& tok) {
  auto slash = tok.find('/');
  if (slash != std::string::npos)  // "0.13/2" (reference hopper quirk)
    return atof(tok.substr(0, slash).c_str()) / atof(tok.substr(slash + 1).c_str());
  return atof(tok.c_str());
}

std::vector<double> floats(const std::string& s) {
  std::vector<double> out;
  std::string tok;
  for (char c : s + " ") {
    if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
      if (!tok.empty()) { out.push_back(fnum(tok)); tok.clear(); }
    } else tok += c;
  }
  return out;
}

V4 norm4(V4 q) {
  double n = sqrt(q[0]*q[0] + q[1]*q[1] + q[2]*q[2] + q[3]*q[3]);
  for (auto& x : q) x /= n;
  return q;
}

V4 quat_mul(const V4& a, const V4& b) {
  return {a[0]*b[0] - a[1]*b[1] - a[2]*b[2] - a[3]*b[3],
          a[0]*b[1] + a[1]*b[0] + a[2]*b[3] - a[3]*b[2],
          a[0]*b[2] - a[1]*b[3] + a[2]*b[0] + a[3]*b[1],
          a[0]*b[3] + a[1]*b[2] - a[2]*b[1] + a[3]*b[0]};
}

V4 quat_conj(const V4& q) { return {q[0], -q[1], -q[2], -q[3]}; }

void quat_to_mat(const V4& q, double R[9]) {
  double w = q[0], x = q[1], y = q[2], z = q[3];
  R[0] = 1 - 2*(y*y + z*z); R[1] = 2*(x*y - w*z); R[2] = 2*(x*z + w*y);
  R[3] = 2*(x*y + w*z); R[4] = 1 - 2*(x*x + z*z); R[5] = 2*(y*z - w*x);
  R[6] = 2*(x*z - w*y); R[7] = 2*(y*z + w*x); R[8] = 1 - 2*(x*x + y*y);
}

V3 mat_tvec(const double R[9], const V3& v) {  // R^T v
  return {R[0]*v[0] + R[3]*v[1] + R[6]*v[2],
          R[1]*v[0] + R[4]*v[1] + R[7]*v[2],
          R[2]*v[0] + R[5]*v[1] + R[8]*v[2]};
}

V3 mat_vec(const double R[9], const V3& v) {
  return {R[0]*v[0] + R[1]*v[1] + R[2]*v[2],
          R[3]*v[0] + R[4]*v[1] + R[5]*v[2],
          R[6]*v[0] + R[7]*v[1] + R[8]*v[2]};
}

V3 cross(const V3& a, const V3& b) {
  return {a[1]*b[2] - a[2]*b[1], a[2]*b[0] - a[0]*b[2], a[0]*b[1] - a[1]*b[0]};
}

V4 z_align_quat(V3 v) {
  double n = sqrt(v[0]*v[0] + v[1]*v[1] + v[2]*v[2]);
  for (auto& x : v) x /= n;
  double c = v[2];
  if (c > 1 - 1e-14) return {1, 0, 0, 0};
  if (c < -1 + 1e-14) return {0, 1, 0, 0};
  V3 axis = {-v[1], v[0], 0.0};  // cross(z, v)
  double an = sqrt(axis[0]*axis[0] + axis[1]*axis[1]);
  axis[0] /= an; axis[1] /= an;
  double half = 0.5 * acos(c < -1 ? -1 : (c > 1 ? 1 : c));
  double s = sin(half);
  return {cos(half), s*axis[0], s*axis[1], s*axis[2]};
}

V4 mat_to_quat(const double R[9]) {
  double tr = R[0] + R[4] + R[8];
  V4 q;
  if (tr > 0) {
    double s = sqrt(tr + 1.0) * 2;
    q = {0.25*s, (R[7]-R[5])/s, (R[2]-R[6])/s, (R[3]-R[1])/s};
  } else if (R[0] > R[4] && R[0] > R[8]) {
    double s = sqrt(1.0 + R[0] - R[4] - R[8]) * 2;
    q = {(R[7]-R[5])/s, 0.25*s, (R[1]+R[3])/s, (R[2]+R[6])/s};
  } else if (R[4] > R[8]) {
    double s = sqrt(1.0 + R[4] - R[0] - R[8]) * 2;
    q = {(R[2]-R[6])/s, (R[1]+R[3])/s, 0.25*s, (R[5]+R[7])/s};
  } else {
    double s = sqrt(1.0 + R[8] - R[0] - R[4]) * 2;
    q = {(R[3]-R[1])/s, (R[2]+R[6])/s, (R[5]+R[7])/s, 0.25*s};
  }
  return norm4(q);
}

// symmetric 3x3 eigendecomposition (Jacobi), eigenvalues descending,
// right-handed eigenvector frame
void eig3_desc(const double A_in[9], double w[3], double V[9]) {
  double A[9];
  memcpy(A, A_in, sizeof A);
  V[0] = V[4] = V[8] = 1; V[1] = V[2] = V[3] = V[5] = V[6] = V[7] = 0;
  for (int sweep = 0; sweep < 64; ++sweep) {
    double off = fabs(A[1]) + fabs(A[2]) + fabs(A[5]);
    if (off < 1e-15) break;
    for (int pq = 0; pq < 3; ++pq) {
      int p = pq == 0 ? 0 : (pq == 1 ? 0 : 1);
      int q = pq == 0 ? 1 : 2;
      double apq = A[p*3 + q];
      if (fabs(apq) < 1e-18) continue;
      double app = A[p*3 + p], aqq = A[q*3 + q];
      double theta = 0.5 * (aqq - app) / apq;
      double t = (theta >= 0 ? 1.0 : -1.0) / (fabs(theta) + sqrt(theta*theta + 1));
      double c = 1.0 / sqrt(t*t + 1), s = t * c;
      for (int k = 0; k < 3; ++k) {
        double akp = A[k*3 + p], akq = A[k*3 + q];
        A[k*3 + p] = c*akp - s*akq;
        A[k*3 + q] = s*akp + c*akq;
      }
      for (int k = 0; k < 3; ++k) {
        double apk = A[p*3 + k], aqk = A[q*3 + k];
        A[p*3 + k] = c*apk - s*aqk;
        A[q*3 + k] = s*apk + c*aqk;
      }
      for (int k = 0; k < 3; ++k) {
        double vkp = V[k*3 + p], vkq = V[k*3 + q];
        V[k*3 + p] = c*vkp - s*vkq;
        V[k*3 + q] = s*vkp + c*vkq;
      }
    }
  }
  int order[3] = {0, 1, 2};
  double d[3] = {A[0], A[4], A[8]};
  for (int i = 0; i < 3; ++i)
    for (int j = i + 1; j < 3; ++j)
      if (d[order[j]] > d[order[i]]) std::swap(order[i], order[j]);
  double Vo[9];
  for (int i = 0; i < 3; ++i) {
    w[i] = d[order[i]];
    for (int k = 0; k < 3; ++k) Vo[k*3 + i] = V[k*3 + order[i]];
  }
  // right-handed
  V3 c0 = {Vo[0], Vo[3], Vo[6]}, c1 = {Vo[1], Vo[4], Vo[7]};
  V3 c2 = cross(c0, c1);
  double det = c2[0]*Vo[2] + c2[1]*Vo[5] + c2[2]*Vo[8];
  if (det < 0) { Vo[2] = -Vo[2]; Vo[5] = -Vo[5]; Vo[8] = -Vo[8]; }
  memcpy(V, Vo, sizeof Vo);
}

// dense symmetric positive definite inverse via Gauss-Jordan (small n)
void inv_dense(std::vector<double>& A, int n, std::vector<double>& out) {
  out.assign(n * n, 0.0);
  for (int i = 0; i < n; ++i) out[i*n + i] = 1.0;
  for (int col = 0; col < n; ++col) {
    int piv = col;
    for (int r = col + 1; r < n; ++r)
      if (fabs(A[r*n + col]) > fabs(A[piv*n + col])) piv = r;
    for (int k = 0; k < n; ++k) {
      std::swap(A[col*n + k], A[piv*n + k]);
      std::swap(out[col*n + k], out[piv*n + k]);
    }
    double d = A[col*n + col];
    for (int k = 0; k < n; ++k) { A[col*n + k] /= d; out[col*n + k] /= d; }
    for (int r = 0; r < n; ++r) {
      if (r == col) continue;
      double f = A[r*n + col];
      if (f == 0) continue;
      for (int k = 0; k < n; ++k) {
        A[r*n + k] -= f * A[col*n + k];
        out[r*n + k] -= f * out[col*n + k];
      }
    }
  }
}

// ---------------------------------------------------------------------------
// MJCF compile (mirrors ilqg_mujoco_tpu/physics/mjcf.py)
// ---------------------------------------------------------------------------

enum { JNT_FREE = 0, JNT_BALL = 1, JNT_SLIDE = 2, JNT_HINGE = 3 };
enum { GEOM_PLANE = 0, GEOM_SPHERE = 2, GEOM_CAPSULE = 3, GEOM_CYLINDER = 5,
       GEOM_BOX = 6 };

int jnt_nv(int t) { return t == JNT_FREE ? 6 : (t == JNT_BALL ? 3 : 1); }
int jnt_nq(int t) { return t == JNT_FREE ? 7 : (t == JNT_BALL ? 4 : 1); }

struct Joint {
  int type, bodyid;
  V3 pos, axis;
  double range[2];
  bool limited;
  double stiffness, armature, damping, frictionloss, margin;
  double solref[2], solimp[5];
  double ref, springref;
  std::string name;
};

struct Geom {
  int type, bodyid;
  V3 pos;
  V4 quat;
  V3 size;
  V3 friction;
  int contype, conaffinity, condim, priority;
  double margin, gap, solmix, density;
  double solref[2], solimp[5];
  bool has_mass;
  double mass;
};

struct Motor {
  int jid;
  double gear;
  double ctrlrange[2];
  bool ctrllimited;
};

struct Compiler {
  std::string error;
  double ang = M_PI / 180.0;
  bool global_coords = false;
  std::map<std::string, std::string> djoint, dgeom, dmotor;
  std::vector<int> body_parent;
  std::vector<V3> body_pos;
  std::vector<V4> body_quat;
  std::vector<Joint> joints;
  std::vector<Geom> geoms;
  std::map<std::string, int> joint_names;
  std::vector<Motor> motors;

  std::string attr(const XmlNode& e, const std::map<std::string, std::string>& d,
                   const char* key, const char* fb) {
    if (auto* a = e.attr(key)) return *a;
    auto it = d.find(key);
    if (it != d.end()) return it->second;
    return fb ? fb : std::string();
  }
  bool has_attr(const XmlNode& e, const std::map<std::string, std::string>& d,
                const char* key) {
    return e.attr(key) || d.count(key);
  }

  void parse_geom(const XmlNode& e, int bid, const V3& xpos, const V4& xquat) {
    Geom g{};
    std::string t = attr(e, dgeom, "type", "sphere");
    if (t == "plane") g.type = GEOM_PLANE;
    else if (t == "sphere") g.type = GEOM_SPHERE;
    else if (t == "capsule") g.type = GEOM_CAPSULE;
    else if (t == "cylinder") g.type = GEOM_CYLINDER;
    else if (t == "box") g.type = GEOM_BOX;
    else { error = "unsupported geom type " + t; return; }
    g.bodyid = bid;
    auto size = floats(attr(e, dgeom, "size", "0 0 0"));
    size.resize(3, 0.0);
    g.size = {size[0], size[1], size[2]};
    {
      std::string ps = attr(e, dgeom, "pos", "0 0 0");
      auto v = floats(ps); v.resize(3, 0.0);
      g.pos = {v[0], v[1], v[2]};
      std::string qs = attr(e, dgeom, "quat", "1 0 0 0");
      auto q = floats(qs); q.resize(4, 0.0);
      g.quat = norm4({q[0], q[1], q[2], q[3]});
    }
    std::string ft = attr(e, dgeom, "fromto", "");
    if (!ft.empty()) {
      auto v = floats(ft);
      V3 p0 = {v[0], v[1], v[2]}, p1 = {v[3], v[4], v[5]};
      g.pos = {(p0[0]+p1[0])/2, (p0[1]+p1[1])/2, (p0[2]+p1[2])/2};
      V3 d = {p1[0]-p0[0], p1[1]-p0[1], p1[2]-p0[2]};
      g.quat = z_align_quat(d);
      double hl = 0.5 * sqrt(d[0]*d[0] + d[1]*d[1] + d[2]*d[2]);
      g.size = {g.size[0], hl, 0.0};
    }
    if (global_coords) {
      double Rb[9]; quat_to_mat(xquat, Rb);
      V3 rel = {g.pos[0]-xpos[0], g.pos[1]-xpos[1], g.pos[2]-xpos[2]};
      g.pos = mat_tvec(Rb, rel);
      g.quat = norm4(quat_mul(quat_conj(xquat), g.quat));
    }
    {
      auto v = floats(attr(e, dgeom, "friction", "1 0.005 0.0001"));
      double dfl[3] = {1.0, 0.005, 0.0001};   // pad with defaults (mjcf.py)
      for (int i = 0; i < 3; ++i)
        g.friction[i] = i < (int)v.size() ? v[i] : dfl[i];
    }
    g.contype = atoi(attr(e, dgeom, "contype", "1").c_str());
    g.conaffinity = atoi(attr(e, dgeom, "conaffinity", "1").c_str());
    g.condim = atoi(attr(e, dgeom, "condim", "3").c_str());
    g.margin = fnum(attr(e, dgeom, "margin", "0"));
    g.gap = fnum(attr(e, dgeom, "gap", "0"));
    {
      auto v = floats(attr(e, dgeom, "solref", "0.02 1")); v.resize(2, 1.0);
      g.solref[0] = v[0]; g.solref[1] = v[1];
      auto w = floats(attr(e, dgeom, "solimp", "0.9 0.95 0.001 0.5 2"));
      double dfl[5] = {0.9, 0.95, 0.001, 0.5, 2.0};
      for (int i = 0; i < 5; ++i) g.solimp[i] = i < (int)w.size() ? w[i] : dfl[i];
    }
    g.solmix = fnum(attr(e, dgeom, "solmix", "1"));
    g.priority = atoi(attr(e, dgeom, "priority", "0").c_str());
    g.density = fnum(attr(e, dgeom, "density", "1000"));
    g.has_mass = has_attr(e, dgeom, "mass");
    g.mass = g.has_mass ? fnum(attr(e, dgeom, "mass", "0")) : 0.0;
    geoms.push_back(g);
  }

  void parse_joint(const XmlNode& e, int bid, const V3& xpos, const V4& xquat,
                   bool is_free) {
    static const std::map<std::string, std::string> empty;
    const auto& d = is_free ? empty : djoint;
    Joint j{};
    std::string t = is_free ? "free" : attr(e, d, "type", "hinge");
    j.type = t == "free" ? JNT_FREE : (t == "ball" ? JNT_BALL :
             (t == "slide" ? JNT_SLIDE : JNT_HINGE));
    j.bodyid = bid;
    {
      auto v = floats(attr(e, d, "pos", "0 0 0")); v.resize(3, 0.0);
      j.pos = {v[0], v[1], v[2]};
      auto a = floats(attr(e, d, "axis", "0 0 1")); a.resize(3, 0.0);
      j.axis = {a[0], a[1], a[2]};
    }
    if (global_coords) {
      double Rb[9]; quat_to_mat(xquat, Rb);
      V3 rel = {j.pos[0]-xpos[0], j.pos[1]-xpos[1], j.pos[2]-xpos[2]};
      j.pos = mat_tvec(Rb, rel);
      j.axis = mat_tvec(Rb, j.axis);
    }
    double n = sqrt(j.axis[0]*j.axis[0] + j.axis[1]*j.axis[1] + j.axis[2]*j.axis[2]);
    if (n > 0) for (auto& x : j.axis) x /= n;
    {
      auto v = floats(attr(e, d, "range", "0 0")); v.resize(2, 0.0);
      j.range[0] = v[0]; j.range[1] = v[1];
    }
    std::string lim = attr(e, d, "limited", "");
    if (lim.empty()) j.limited = j.range[0] != 0 || j.range[1] != 0;
    else j.limited = lim == "true";
    if (j.type == JNT_HINGE || j.type == JNT_BALL) {
      j.range[0] *= ang; j.range[1] *= ang;
    }
    if (j.type == JNT_FREE) j.limited = false;
    j.ref = fnum(attr(e, d, "ref", "0"));
    j.springref = fnum(attr(e, d, "springref", "0"));
    if (j.type == JNT_HINGE) { j.ref *= ang; j.springref *= ang; }
    j.stiffness = fnum(attr(e, d, "stiffness", "0"));
    j.armature = fnum(attr(e, d, "armature", "0"));
    j.damping = fnum(attr(e, d, "damping", "0"));
    j.frictionloss = fnum(attr(e, d, "frictionloss", "0"));
    j.margin = fnum(attr(e, d, "margin", "0"));
    {
      auto v = floats(attr(e, d, "solreflimit", "0.02 1")); v.resize(2, 1.0);
      j.solref[0] = v[0]; j.solref[1] = v[1];
      auto w = floats(attr(e, d, "solimplimit", "0.9 0.95 0.001 0.5 2"));
      double dfl[5] = {0.9, 0.95, 0.001, 0.5, 2.0};
      for (int i = 0; i < 5; ++i) j.solimp[i] = i < (int)w.size() ? w[i] : dfl[i];
    }
    j.name = e.attr("name") ? *e.attr("name")
                            : "joint" + std::to_string(joints.size());
    joint_names[j.name] = (int)joints.size();
    joints.push_back(j);
  }

  void parse_body(const XmlNode& e, int parent, const V3& pxpos, const V4& pxquat) {
    V3 pos = {0, 0, 0};
    V4 quat = {1, 0, 0, 0};
    if (auto* a = e.attr("pos")) { auto v = floats(*a); v.resize(3, 0.0); pos = {v[0], v[1], v[2]}; }
    if (auto* a = e.attr("quat")) { auto v = floats(*a); v.resize(4, 0.0); quat = norm4({v[0], v[1], v[2], v[3]}); }
    V3 lpos, xpos;
    V4 lquat, xquat;
    double Rp[9]; quat_to_mat(pxquat, Rp);
    if (global_coords) {
      xpos = pos; xquat = quat;
      V3 rel = {pos[0]-pxpos[0], pos[1]-pxpos[1], pos[2]-pxpos[2]};
      lpos = mat_tvec(Rp, rel);
      lquat = norm4(quat_mul(quat_conj(pxquat), quat));
    } else {
      lpos = pos; lquat = quat;
      V3 w = mat_vec(Rp, pos);
      xpos = {pxpos[0]+w[0], pxpos[1]+w[1], pxpos[2]+w[2]};
      xquat = norm4(quat_mul(pxquat, quat));
    }
    body_parent.push_back(parent);
    body_pos.push_back(lpos);
    body_quat.push_back(lquat);
    int bid = (int)body_pos.size() - 1;
    for (auto& c : e.children) {
      if (c->tag == "geom") parse_geom(*c, bid, xpos, xquat);
      else if (c->tag == "joint") parse_joint(*c, bid, xpos, xquat, false);
      else if (c->tag == "freejoint") parse_joint(*c, bid, xpos, xquat, true);
      else if (c->tag == "body") parse_body(*c, bid, xpos, xquat);
    }
  }
};

void parse_defaults(const XmlNode& d, Compiler& c) {
  for (auto& ch : d.children) {
    if (ch->tag == "joint") for (auto& kv : ch->attrs) c.djoint[kv.first] = kv.second;
    else if (ch->tag == "geom") for (auto& kv : ch->attrs) c.dgeom[kv.first] = kv.second;
    else if (ch->tag == "motor") for (auto& kv : ch->attrs) c.dmotor[kv.first] = kv.second;
    else if (ch->tag == "default") parse_defaults(*ch, c);
  }
}

void geom_mass_inertia(const Geom& g, double& m, V3& I) {
  const double pi = M_PI;
  m = 0; I = {0, 0, 0};
  if (g.type == GEOM_SPHERE) {
    double r = g.size[0];
    m = g.density * 4.0/3.0 * pi * r*r*r;
    double i = 0.4 * m * r * r;
    I = {i, i, i};
  } else if (g.type == GEOM_CAPSULE) {
    double r = g.size[0], hl = g.size[1], h = 2*hl;
    double ms = g.density * 4.0/3.0 * pi * r*r*r;
    double mc = g.density * pi * r*r*h;
    m = ms + mc;
    double iz = 0.4*ms*r*r + 0.5*mc*r*r;
    double ix = 0.4*ms*r*r + mc*(3*r*r + h*h)/12.0 + ms*(h*h/4.0 + 3.0*h*r/8.0);
    I = {ix, ix, iz};
  } else if (g.type == GEOM_CYLINDER) {
    double r = g.size[0], h = 2*g.size[1];
    m = g.density * pi * r*r*h;
    I = {m*(3*r*r + h*h)/12.0, m*(3*r*r + h*h)/12.0, 0.5*m*r*r};
  } else if (g.type == GEOM_BOX) {
    double sx = g.size[0], sy = g.size[1], sz = g.size[2];
    m = g.density * 8.0 * sx*sy*sz;
    I = {m/3.0*(sy*sy + sz*sz), m/3.0*(sx*sx + sz*sz), m/3.0*(sx*sx + sy*sy)};
  }
  if (g.has_mass && m > 0) {
    double sc = g.mass / m;
    m = g.mass;
    for (auto& x : I) x *= sc;
  }
}

}  // namespace

// ---------------------------------------------------------------------------
// C ABI
// ---------------------------------------------------------------------------

#include "ilqg_model.h"

extern "C" {

static double* dalloc(size_t n) { return (double*)calloc(n ? n : 1, sizeof(double)); }
static int32_t* ialloc(size_t n) { return (int32_t*)calloc(n ? n : 1, sizeof(int32_t)); }

int ilqg_compile_mjcf(const char* xml_text, IlqgModel* out) {
  memset(out, 0, sizeof(*out));
  const std::string xml(xml_text);   // must outlive the parser's pointers
  XmlParser parser{xml};
  auto root = parser.parse_element();
  if (!root || root->tag != "mujoco") {
    snprintf(out->error, sizeof out->error, "parse error: %s",
             parser.error.c_str());
    return -1;
  }

  Compiler c;
  if (auto* comp = root->child("compiler")) {
    if (auto* a = comp->attr("angle")) c.ang = (*a == "degree") ? M_PI/180.0 : 1.0;
    if (auto* a = comp->attr("coordinate")) c.global_coords = *a == "global";
  }
  if (auto* d = root->child("default")) parse_defaults(*d, c);

  // options
  out->timestep = 0.002;
  out->gravity[0] = 0; out->gravity[1] = 0; out->gravity[2] = -9.81;
  out->integrator = 0;
  out->iterations = 100;
  out->tolerance = 1e-8;
  out->impratio = 1.0;
  out->cone = 0;
  out->o_solref[0] = 0.02; out->o_solref[1] = 1.0;
  double o_solimp_dflt[5] = {0.9, 0.95, 0.001, 0.5, 2.0};
  memcpy(out->o_solimp, o_solimp_dflt, sizeof o_solimp_dflt);
  if (auto* o = root->child("option")) {
    if (auto* a = o->attr("timestep")) out->timestep = fnum(*a);
    if (auto* a = o->attr("gravity")) {
      auto v = floats(*a); v.resize(3, 0.0);
      for (int i = 0; i < 3; ++i) out->gravity[i] = v[i];
    }
    if (auto* a = o->attr("integrator")) out->integrator = (*a == "RK4") ? 1 : 0;
    if (auto* a = o->attr("iterations")) out->iterations = atoi(a->c_str());
    if (auto* a = o->attr("tolerance")) out->tolerance = fnum(*a);
    if (auto* a = o->attr("impratio")) out->impratio = fnum(*a);
    if (auto* a = o->attr("cone")) out->cone = (*a == "elliptic") ? 1 : 0;
    if (auto* a = o->attr("o_solref")) {
      auto v = floats(*a); v.resize(2, 1.0);
      out->o_solref[0] = v[0]; out->o_solref[1] = v[1];
    }
    if (auto* a = o->attr("o_solimp")) {
      auto v = floats(*a);
      for (size_t i = 0; i < 5 && i < v.size(); ++i) out->o_solimp[i] = v[i];
    }
    if (auto* f = o->child("flag"))
      if (auto* a = f->attr("override")) out->override_active = *a == "enable";
  }

  // worldbody
  c.body_parent.push_back(0);
  c.body_pos.push_back({0, 0, 0});
  c.body_quat.push_back({1, 0, 0, 0});
  auto* world = root->child("worldbody");
  if (!world) {
    snprintf(out->error, sizeof out->error, "no worldbody");
    return -1;
  }
  for (auto& ch : world->children) {
    if (ch->tag == "geom") c.parse_geom(*ch, 0, {0, 0, 0}, {1, 0, 0, 0});
    else if (ch->tag == "body") c.parse_body(*ch, 0, {0, 0, 0}, {1, 0, 0, 0});
  }
  if (!c.error.empty()) {
    snprintf(out->error, sizeof out->error, "%s", c.error.c_str());
    return -1;
  }

  // actuators
  if (auto* act = root->child("actuator")) {
    for (auto& a : act->children) {
      if (a->tag != "motor") continue;
      Motor mo{};
      std::string jn = c.attr(*a, c.dmotor, "joint", "");
      if (!c.joint_names.count(jn)) {
        snprintf(out->error, sizeof out->error, "unknown joint %s", jn.c_str());
        return -1;
      }
      mo.jid = c.joint_names[jn];
      mo.gear = floats(c.attr(*a, c.dmotor, "gear", "1"))[0];
      auto cr = floats(c.attr(*a, c.dmotor, "ctrlrange", "0 0"));
      cr.resize(2, 0.0);
      mo.ctrlrange[0] = cr[0]; mo.ctrlrange[1] = cr[1];
      std::string cl = c.attr(*a, c.dmotor, "ctrllimited", "");
      mo.ctrllimited = cl.empty() ? (cr[0] != 0 || cr[1] != 0) : cl == "true";
      c.motors.push_back(mo);
    }
  }

  const int nbody = (int)c.body_pos.size();
  const int njnt = (int)c.joints.size();
  const int ngeom = (int)c.geoms.size();
  const int nu = (int)c.motors.size();
  int nq = 0, nv = 0;
  std::vector<int> qposadr(njnt), dofadr(njnt);
  for (int i = 0; i < njnt; ++i) {
    qposadr[i] = nq; dofadr[i] = nv;
    nq += jnt_nq(c.joints[i].type);
    nv += jnt_nv(c.joints[i].type);
  }
  out->nq = nq; out->nv = nv; out->nu = nu;
  out->nbody = nbody; out->njnt = njnt; out->ngeom = ngeom;

  // bodies + inertial from geoms
  out->body_parentid = ialloc(nbody);
  out->body_pos = dalloc(nbody * 3);
  out->body_quat = dalloc(nbody * 4);
  out->body_ipos = dalloc(nbody * 3);
  out->body_iquat = dalloc(nbody * 4);
  out->body_mass = dalloc(nbody);
  out->body_inertia = dalloc(nbody * 3);
  for (int b = 0; b < nbody; ++b) {
    out->body_parentid[b] = c.body_parent[b];
    for (int k = 0; k < 3; ++k) out->body_pos[b*3 + k] = c.body_pos[b][k];
    for (int k = 0; k < 4; ++k) out->body_quat[b*4 + k] = c.body_quat[b][k];
    out->body_iquat[b*4] = 1.0;
    if (b == 0) continue;
    double M = 0;
    V3 com = {0, 0, 0};
    std::vector<int> gids;
    for (int gi = 0; gi < ngeom; ++gi)
      if (c.geoms[gi].bodyid == b) gids.push_back(gi);
    std::vector<double> gm(gids.size());
    std::vector<V3> gI(gids.size());
    for (size_t k = 0; k < gids.size(); ++k) {
      geom_mass_inertia(c.geoms[gids[k]], gm[k], gI[k]);
      M += gm[k];
      for (int x = 0; x < 3; ++x) com[x] += gm[k] * c.geoms[gids[k]].pos[x];
    }
    if (M <= 0) continue;
    for (auto& x : com) x /= M;
    double Itot[9] = {0};
    for (size_t k = 0; k < gids.size(); ++k) {
      double R[9]; quat_to_mat(c.geoms[gids[k]].quat, R);
      // R diag(I) R^T
      for (int r = 0; r < 3; ++r)
        for (int s = 0; s < 3; ++s)
          for (int t2 = 0; t2 < 3; ++t2)
            Itot[r*3 + s] += R[r*3 + t2] * gI[k][t2] * R[s*3 + t2];
      V3 d3 = {c.geoms[gids[k]].pos[0] - com[0],
               c.geoms[gids[k]].pos[1] - com[1],
               c.geoms[gids[k]].pos[2] - com[2]};
      double dd = d3[0]*d3[0] + d3[1]*d3[1] + d3[2]*d3[2];
      for (int r = 0; r < 3; ++r)
        for (int s = 0; s < 3; ++s)
          Itot[r*3 + s] += gm[k] * ((r == s ? dd : 0.0) - d3[r]*d3[s]);
    }
    double w[3], Vm[9];
    eig3_desc(Itot, w, Vm);
    out->body_mass[b] = M;
    for (int k = 0; k < 3; ++k) {
      out->body_ipos[b*3 + k] = com[k];
      out->body_inertia[b*3 + k] = w[k];
    }
    V4 iq = mat_to_quat(Vm);
    for (int k = 0; k < 4; ++k) out->body_iquat[b*4 + k] = iq[k];
  }

  // joints / dofs
  out->jnt_type = ialloc(njnt);
  out->jnt_bodyid = ialloc(njnt);
  out->jnt_qposadr = ialloc(njnt);
  out->jnt_dofadr = ialloc(njnt);
  out->jnt_pos = dalloc(njnt * 3);
  out->jnt_axis = dalloc(njnt * 3);
  out->jnt_range = dalloc(njnt * 2);
  out->jnt_limited = (uint8_t*)calloc(njnt ? njnt : 1, 1);
  out->jnt_stiffness = dalloc(njnt);
  out->jnt_margin = dalloc(njnt);
  out->jnt_solref = dalloc(njnt * 2);
  out->jnt_solimp = dalloc(njnt * 5);
  out->qpos_spring = dalloc(nq);
  out->qpos0 = dalloc(nq);
  out->dof_bodyid = ialloc(nv);
  out->dof_jntid = ialloc(nv);
  out->dof_armature = dalloc(nv);
  out->dof_damping = dalloc(nv);
  out->dof_frictionloss = dalloc(nv);
  for (int i = 0; i < njnt; ++i) {
    const Joint& j = c.joints[i];
    out->jnt_type[i] = j.type;
    out->jnt_bodyid[i] = j.bodyid;
    out->jnt_qposadr[i] = qposadr[i];
    out->jnt_dofadr[i] = dofadr[i];
    for (int k = 0; k < 3; ++k) {
      out->jnt_pos[i*3 + k] = j.pos[k];
      out->jnt_axis[i*3 + k] = j.axis[k];
    }
    out->jnt_range[i*2] = j.range[0];
    out->jnt_range[i*2 + 1] = j.range[1];
    out->jnt_limited[i] = j.limited;
    out->jnt_stiffness[i] = j.stiffness;
    out->jnt_margin[i] = j.margin;
    out->jnt_solref[i*2] = j.solref[0];
    out->jnt_solref[i*2 + 1] = j.solref[1];
    for (int k = 0; k < 5; ++k) out->jnt_solimp[i*5 + k] = j.solimp[k];
    int w = jnt_nv(j.type);
    for (int k = 0; k < w; ++k) {
      out->dof_bodyid[dofadr[i] + k] = j.bodyid;
      out->dof_jntid[dofadr[i] + k] = i;
      out->dof_armature[dofadr[i] + k] = j.armature;
      out->dof_damping[dofadr[i] + k] = j.damping;
      out->dof_frictionloss[dofadr[i] + k] = j.frictionloss;
    }
    if (j.type == JNT_SLIDE || j.type == JNT_HINGE) {
      out->qpos0[qposadr[i]] = j.ref;
      out->qpos_spring[qposadr[i]] = j.springref;
    } else if (j.type == JNT_BALL) {
      out->qpos0[qposadr[i]] = 1.0;
      out->qpos_spring[qposadr[i]] = 1.0;
    } else {
      out->qpos0[qposadr[i] + 3] = 1.0;
      out->qpos_spring[qposadr[i] + 3] = 1.0;
    }
  }

  // reference global pose (for free-joint qpos0 + invweight0)
  std::vector<V3> rx(nbody, {0, 0, 0});
  std::vector<V4> rq(nbody, {1, 0, 0, 0});
  for (int b = 1; b < nbody; ++b) {
    int p = c.body_parent[b];
    double Rp[9]; quat_to_mat(rq[p], Rp);
    V3 w = mat_vec(Rp, c.body_pos[b]);
    rx[b] = {rx[p][0]+w[0], rx[p][1]+w[1], rx[p][2]+w[2]};
    rq[b] = norm4(quat_mul(rq[p], c.body_quat[b]));
  }
  for (int i = 0; i < njnt; ++i) {
    if (c.joints[i].type != JNT_FREE) continue;
    int qa = qposadr[i], b = c.joints[i].bodyid;
    for (int k = 0; k < 3; ++k) out->qpos0[qa + k] = rx[b][k];
    for (int k = 0; k < 4; ++k) out->qpos0[qa + 3 + k] = rq[b][k];
    for (int k = 0; k < 7; ++k) out->qpos_spring[qa + k] = out->qpos0[qa + k];
  }

  // geoms
  out->geom_type = ialloc(ngeom);
  out->geom_bodyid = ialloc(ngeom);
  out->geom_pos = dalloc(ngeom * 3);
  out->geom_quat = dalloc(ngeom * 4);
  out->geom_size = dalloc(ngeom * 3);
  out->geom_friction = dalloc(ngeom * 3);
  out->geom_contype = ialloc(ngeom);
  out->geom_conaffinity = ialloc(ngeom);
  out->geom_condim = ialloc(ngeom);
  out->geom_margin = dalloc(ngeom);
  out->geom_gap = dalloc(ngeom);
  out->geom_solref = dalloc(ngeom * 2);
  out->geom_solimp = dalloc(ngeom * 5);
  out->geom_solmix = dalloc(ngeom);
  out->geom_priority = ialloc(ngeom);
  for (int g = 0; g < ngeom; ++g) {
    const Geom& ge = c.geoms[g];
    out->geom_type[g] = ge.type;
    out->geom_bodyid[g] = ge.bodyid;
    for (int k = 0; k < 3; ++k) {
      out->geom_pos[g*3 + k] = ge.pos[k];
      out->geom_size[g*3 + k] = ge.size[k];
      out->geom_friction[g*3 + k] = ge.friction[k];
    }
    for (int k = 0; k < 4; ++k) out->geom_quat[g*4 + k] = ge.quat[k];
    out->geom_contype[g] = ge.contype;
    out->geom_conaffinity[g] = ge.conaffinity;
    out->geom_condim[g] = ge.condim;
    out->geom_margin[g] = ge.margin;
    out->geom_gap[g] = ge.gap;
    out->geom_solref[g*2] = ge.solref[0];
    out->geom_solref[g*2 + 1] = ge.solref[1];
    for (int k = 0; k < 5; ++k) out->geom_solimp[g*5 + k] = ge.solimp[k];
    out->geom_solmix[g] = ge.solmix;
    out->geom_priority[g] = ge.priority;
  }

  // actuators
  out->actuator_trnid = ialloc(nu);
  out->actuator_gear = dalloc(nu);
  out->actuator_ctrllimited = (uint8_t*)calloc(nu ? nu : 1, 1);
  out->actuator_ctrlrange = dalloc(nu * 2);
  for (int u = 0; u < nu; ++u) {
    out->actuator_trnid[u] = c.motors[u].jid;
    out->actuator_gear[u] = c.motors[u].gear;
    out->actuator_ctrllimited[u] = c.motors[u].ctrllimited;
    out->actuator_ctrlrange[u*2] = c.motors[u].ctrlrange[0];
    out->actuator_ctrlrange[u*2 + 1] = c.motors[u].ctrlrange[1];
  }

  // collision pairs (same rules + ordering as mjcf.py)
  std::vector<int> p1, p2;
  auto pair_ok = [](int t1, int t2) {
    int a = std::min(t1, t2), b = std::max(t1, t2);
    return (a == GEOM_PLANE && (b == GEOM_SPHERE || b == GEOM_CAPSULE ||
                                b == GEOM_BOX)) ||
           (a == GEOM_SPHERE && (b == GEOM_SPHERE || b == GEOM_CAPSULE)) ||
           (a == GEOM_CAPSULE && b == GEOM_CAPSULE);
  };
  for (int g1 = 0; g1 < ngeom; ++g1)
    for (int g2 = g1 + 1; g2 < ngeom; ++g2) {
      int b1 = c.geoms[g1].bodyid, b2 = c.geoms[g2].bodyid;
      if (b1 == b2) continue;
      if ((c.body_parent[b2] == b1 && b1 != 0) ||
          (c.body_parent[b1] == b2 && b2 != 0))
        continue;
      if (!((c.geoms[g1].contype & c.geoms[g2].conaffinity) ||
            (c.geoms[g2].contype & c.geoms[g1].conaffinity)))
        continue;
      if (!pair_ok(c.geoms[g1].type, c.geoms[g2].type)) continue;
      if (c.geoms[g1].type <= c.geoms[g2].type) {
        p1.push_back(g1); p2.push_back(g2);
      } else {
        p1.push_back(g2); p2.push_back(g1);
      }
    }
  out->npair = (int)p1.size();
  out->pair_geom1 = ialloc(p1.size());
  out->pair_geom2 = ialloc(p1.size());
  for (size_t i = 0; i < p1.size(); ++i) {
    out->pair_geom1[i] = p1[i];
    out->pair_geom2[i] = p2[i];
  }

  // invweight0 at qpos0 (mirrors mjcf.py _invweight0)
  out->dof_invweight0 = dalloc(nv);
  out->body_invweight0 = dalloc(nbody * 2);
  {
    std::vector<double> S(nv * 6, 0.0);
    for (int i = 0; i < njnt; ++i) {
      const Joint& j = c.joints[i];
      int b = j.bodyid, da = dofadr[i];
      double R[9]; quat_to_mat(rq[b], R);
      if (j.type == JNT_FREE) {
        for (int k = 0; k < 3; ++k) S[(da + k)*6 + 3 + k] = 1.0;
        for (int k = 0; k < 3; ++k) {
          V3 w = {R[k], R[3 + k], R[6 + k]};
          V3 cr = cross(rx[b], w);
          for (int x = 0; x < 3; ++x) {
            S[(da + 3 + k)*6 + x] = w[x];
            S[(da + 3 + k)*6 + 3 + x] = cr[x];
          }
        }
      } else {
        V3 anchor_l = mat_vec(R, j.pos);
        V3 anchor = {rx[b][0]+anchor_l[0], rx[b][1]+anchor_l[1], rx[b][2]+anchor_l[2]};
        if (j.type == JNT_BALL) {
          for (int k = 0; k < 3; ++k) {
            V3 w = {R[k], R[3 + k], R[6 + k]};
            V3 cr = cross(anchor, w);
            for (int x = 0; x < 3; ++x) {
              S[(da + k)*6 + x] = w[x];
              S[(da + k)*6 + 3 + x] = cr[x];
            }
          }
        } else {
          V3 axis = mat_vec(R, j.axis);
          if (j.type == JNT_SLIDE) {
            for (int x = 0; x < 3; ++x) S[da*6 + 3 + x] = axis[x];
          } else {
            V3 cr = cross(anchor, axis);
            for (int x = 0; x < 3; ++x) {
              S[da*6 + x] = axis[x];
              S[da*6 + 3 + x] = cr[x];
            }
          }
        }
      }
    }
    // ancestor mask
    std::vector<uint8_t> mask(nbody * nv, 0);
    for (int b = 0; b < nbody; ++b) {
      for (int i = 0; i < nv; ++i) {
        int a = b;
        while (a != 0) {
          if (a == out->dof_bodyid[i]) { mask[b*nv + i] = 1; break; }
          a = c.body_parent[a];
        }
      }
    }
    // mass matrix
    std::vector<double> M(nv * nv, 0.0);
    for (int i = 0; i < nv; ++i) M[i*nv + i] = out->dof_armature[i];
    std::vector<V3> coms(nbody, {0, 0, 0});
    for (int b = 1; b < nbody; ++b) {
      double R[9]; quat_to_mat(rq[b], R);
      double Ri[9]; {
        double Rq[9]; quat_to_mat({out->body_iquat[b*4], out->body_iquat[b*4+1],
                                   out->body_iquat[b*4+2], out->body_iquat[b*4+3]}, Rq);
        for (int r = 0; r < 3; ++r)
          for (int s = 0; s < 3; ++s) {
            Ri[r*3 + s] = 0;
            for (int k = 0; k < 3; ++k) Ri[r*3 + s] += R[r*3 + k]*Rq[k*3 + s];
          }
      }
      V3 ip = {out->body_ipos[b*3], out->body_ipos[b*3+1], out->body_ipos[b*3+2]};
      V3 ipw = mat_vec(R, ip);
      V3 com = {rx[b][0]+ipw[0], rx[b][1]+ipw[1], rx[b][2]+ipw[2]};
      coms[b] = com;
      double Ic[9] = {0};
      for (int r = 0; r < 3; ++r)
        for (int s = 0; s < 3; ++s)
          for (int k = 0; k < 3; ++k)
            Ic[r*3 + s] += Ri[r*3 + k]*out->body_inertia[b*3 + k]*Ri[s*3 + k];
      double mss = out->body_mass[b];
      double sc[9] = {0, -com[2], com[1], com[2], 0, -com[0], -com[1], com[0], 0};
      double I6[36];
      for (int r = 0; r < 3; ++r)
        for (int s = 0; s < 3; ++s) {
          double scsct = 0;
          for (int k = 0; k < 3; ++k) scsct += sc[r*3 + k]*sc[s*3 + k];
          I6[r*6 + s] = Ic[r*3 + s] + mss*scsct;
          I6[r*6 + 3 + s] = mss*sc[r*3 + s];
          I6[(3 + r)*6 + s] = mss*sc[s*3 + r];
          I6[(3 + r)*6 + 3 + s] = (r == s) ? mss : 0.0;
        }
      for (int i = 0; i < nv; ++i) {
        if (!mask[b*nv + i]) continue;
        double IS[6];
        for (int r = 0; r < 6; ++r) {
          IS[r] = 0;
          for (int k = 0; k < 6; ++k) IS[r] += I6[r*6 + k]*S[i*6 + k];
        }
        for (int j2 = 0; j2 < nv; ++j2) {
          if (!mask[b*nv + j2]) continue;
          double v = 0;
          for (int r = 0; r < 6; ++r) v += S[j2*6 + r]*IS[r];
          M[j2*nv + i] += v;
        }
      }
    }
    std::vector<double> Mcopy(M), Minv;
    if (nv) inv_dense(Mcopy, nv, Minv);
    for (int i = 0; i < nv; ++i) out->dof_invweight0[i] = Minv[i*nv + i];
    for (int i = 0; i < njnt; ++i) {  // joint averaging (MuJoCo mj_setConst)
      int t = c.joints[i].type, da = dofadr[i];
      if (t == JNT_FREE) {
        double a = (out->dof_invweight0[da] + out->dof_invweight0[da+1] +
                    out->dof_invweight0[da+2]) / 3.0;
        double r2 = (out->dof_invweight0[da+3] + out->dof_invweight0[da+4] +
                     out->dof_invweight0[da+5]) / 3.0;
        for (int k = 0; k < 3; ++k) {
          out->dof_invweight0[da + k] = a;
          out->dof_invweight0[da + 3 + k] = r2;
        }
      } else if (t == JNT_BALL) {
        double a = (out->dof_invweight0[da] + out->dof_invweight0[da+1] +
                    out->dof_invweight0[da+2]) / 3.0;
        for (int k = 0; k < 3; ++k) out->dof_invweight0[da + k] = a;
      }
    }
    for (int b = 1; b < nbody; ++b) {
      // Jt rows: S_lin + S_ang x com ; Jr rows: S_ang
      std::vector<double> Jt(3 * nv, 0.0), Jr(3 * nv, 0.0);
      for (int i = 0; i < nv; ++i) {
        if (!mask[b*nv + i]) continue;
        V3 sang = {S[i*6], S[i*6+1], S[i*6+2]};
        V3 slin = {S[i*6+3], S[i*6+4], S[i*6+5]};
        V3 cr = cross(sang, coms[b]);
        for (int x = 0; x < 3; ++x) {
          Jt[x*nv + i] = slin[x] + cr[x];
          Jr[x*nv + i] = sang[x];
        }
      }
      auto trace3 = [&](std::vector<double>& J) {
        double tr = 0;
        for (int x = 0; x < 3; ++x) {
          // (J Minv J^T)_{xx}
          for (int i = 0; i < nv; ++i) {
            double mi = 0;
            for (int k = 0; k < nv; ++k) mi += Minv[i*nv + k]*J[x*nv + k];
            tr += J[x*nv + i]*mi;
          }
        }
        return tr / 3.0;
      };
      out->body_invweight0[b*2] = trace3(Jt);
      out->body_invweight0[b*2 + 1] = trace3(Jr);
    }
  }
  return 0;
}

void ilqg_free_model(IlqgModel* m) {
  double* dptrs[] = {m->body_pos, m->body_quat, m->body_ipos, m->body_iquat,
      m->body_mass, m->body_inertia, m->jnt_pos, m->jnt_axis, m->jnt_range,
      m->jnt_stiffness, m->jnt_margin, m->jnt_solref, m->jnt_solimp,
      m->qpos_spring, m->qpos0, m->dof_armature, m->dof_damping,
      m->dof_frictionloss, m->geom_pos, m->geom_quat, m->geom_size,
      m->geom_friction, m->geom_margin, m->geom_gap, m->geom_solref,
      m->geom_solimp, m->geom_solmix, m->actuator_gear, m->actuator_ctrlrange,
      m->dof_invweight0, m->body_invweight0};
  for (auto* p : dptrs) free(p);
  int32_t* iptrs[] = {m->body_parentid, m->jnt_type, m->jnt_bodyid,
      m->jnt_qposadr, m->jnt_dofadr, m->dof_bodyid, m->dof_jntid,
      m->geom_type, m->geom_bodyid, m->geom_contype, m->geom_conaffinity,
      m->geom_condim, m->geom_priority, m->actuator_trnid, m->pair_geom1,
      m->pair_geom2};
  for (auto* p : iptrs) free(p);
  free(m->jnt_limited);
  free(m->actuator_ctrllimited);
  memset(m, 0, sizeof(*m));
}

}  // extern "C"
