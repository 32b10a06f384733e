// Native Wavefront-OBJ scanner — the fast path behind scene/objio.py.
//
// Replicates the Python parser's semantics EXACTLY (which in turn
// replicate the reference's hand-rolled C++ loader,
// /root/reference/src/vk_engine.cpp:800-1037): one group per usemtl run
// with the first-usemtl special case (vk_engine.cpp:963-966), per-group
// smooth flag captured at flush and reset per group (:1002), negative
// (relative) indices, n-gon fan triangulation, missing-normal geometric
// fallback keyed on the FIRST corner's normal index, vt second component
// defaulting to 0.  Floats parse via strtod then narrow to f32 so the
// values match Python's float()->np.float32 double-rounding bit for bit.
//
// Two-pass protocol (file read twice; page cache makes pass 1 ~free):
//   rt_obj_sizes(path, out[6]) ->
//     {n_tris, n_groups, mat_bytes, mtllib_bytes, 0, 0}, rc<0 on error
//   rt_obj_parse(path, tri_pos, tri_nrm, tri_uv, group_start,
//                group_smooth, group_mat_off, mat_buf, mtllib_buf)
//     -> n_groups (rc<0 on error)
// where group_mat_off[g] is a byte offset into mat_buf ('\0'-separated
// names) or -1 for "no usemtl yet", and mtllib_buf gets the LAST mtllib
// line's (path-relative) name, '\0'-terminated ('\0' alone when absent).

#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Corner {
  int64_t v, t, n;
};

// Whitespace-split like Python str.split(): any run of spaces/tabs/CR.
inline const char *skip_ws(const char *p, const char *end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r')) p++;
  return p;
}

inline const char *token_end(const char *p, const char *end) {
  while (p < end && *p != ' ' && *p != '\t' && *p != '\r') p++;
  return p;
}

struct Line {
  const char *tag;
  size_t tag_len;
  const char *rest;  // first char after the tag (unskipped)
  const char *end;
};

inline bool tag_is(const Line &l, const char *s) {
  return l.tag_len == strlen(s) && memcmp(l.tag, s, l.tag_len) == 0;
}

// rstrip + lstrip a [b,e) span (Python .strip()).
inline void strip_span(const char *&b, const char *&e) {
  while (b < e && (*b == ' ' || *b == '\t' || *b == '\r')) b++;
  while (e > b && (e[-1] == ' ' || e[-1] == '\t' || e[-1] == '\r')) e--;
}

class Scanner {
 public:
  explicit Scanner(const char *data, size_t len) : p_(data), end_(data + len) {}

  bool next(Line &out) {
    while (p_ < end_) {
      const char *b = p_;
      const char *e = static_cast<const char *>(memchr(b, '\n', end_ - b));
      const char *stop = e ? e : end_;
      p_ = e ? e + 1 : end_;
      const char *sb = b, *se = stop;
      strip_span(sb, se);
      if (sb >= se || *sb == '#') continue;
      out.tag = sb;
      out.tag_len = token_end(sb, se) - sb;
      out.rest = sb + out.tag_len;
      out.end = se;
      return true;
    }
    return false;
  }

 private:
  const char *p_;
  const char *end_;
};

inline float pyf32(const char *s, char **endp) {
  // match Python: decimal -> f64 -> f32 (double rounding included)
  return static_cast<float>(strtod(s, endp));
}

bool read_file(const char *path, std::vector<char> &buf) {
  FILE *f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long sz = ftell(f);
  if (sz < 0) {
    fclose(f);
    return false;
  }
  fseek(f, 0, SEEK_SET);
  buf.resize(static_cast<size_t>(sz));
  size_t got = sz ? fread(buf.data(), 1, buf.size(), f) : 0;
  fclose(f);
  return got == buf.size();
}

// Parse the face corner specs on an f line into `corners`; v/t/n counts
// are the CURRENT totals (for relative indices).
void parse_corners(const Line &l, int64_t nv, int64_t nt, int64_t nn,
                   std::vector<Corner> &corners) {
  corners.clear();
  const char *p = skip_ws(l.rest, l.end);
  while (p < l.end) {
    const char *te = token_end(p, l.end);
    Corner c{0, -1, -1};
    char *q = nullptr;
    long long vi = strtoll(p, &q, 10);
    c.v = vi > 0 ? vi - 1 : nv + vi;
    if (q < te && *q == '/') {
      q++;
      if (q < te && *q != '/') {
        long long ti = strtoll(q, &q, 10);
        c.t = ti > 0 ? ti - 1 : nt + ti;
      }
      if (q < te && *q == '/') {
        q++;
        if (q < te) {
          long long ni = strtoll(q, &q, 10);
          c.n = ni > 0 ? ni - 1 : nn + ni;
        }
      }
    }
    corners.push_back(c);
    p = skip_ws(te, l.end);
  }
}

}  // namespace

extern "C" {

// out[0]=n_tris out[1]=n_groups out[2]=mat_bytes out[3]=mtllib_bytes
int64_t rt_obj_sizes(const char *path, int64_t *out) {
  std::vector<char> buf;
  if (!read_file(path, buf)) return -1;
  Scanner sc(buf.data(), buf.size());
  Line l;
  int64_t nv = 0, nt = 0, nn = 0, tris = 0, groups = 0, mat_bytes = 1,
          mtllib_bytes = 1;
  int64_t cur_tris = 0;
  bool have_mat = false;
  std::vector<Corner> corners;
  while (sc.next(l)) {
    if (tag_is(l, "v")) {
      nv++;
    } else if (tag_is(l, "vt")) {
      nt++;
    } else if (tag_is(l, "vn")) {
      nn++;
    } else if (tag_is(l, "f")) {
      parse_corners(l, nv, nt, nn, corners);
      if (corners.size() >= 3) cur_tris += corners.size() - 2;
    } else if (tag_is(l, "usemtl")) {
      const char *b = l.rest, *e = l.end;
      strip_span(b, e);
      if (!have_mat && cur_tris == 0) {
        have_mat = true;
      } else {
        if (cur_tris) {
          groups++;
          tris += cur_tris;
          cur_tris = 0;
        }
        have_mat = true;
      }
      mat_bytes += (e - b) + 1;
    } else if (tag_is(l, "mtllib")) {
      const char *b = l.rest, *e = l.end;
      strip_span(b, e);
      mtllib_bytes = (e - b) + 1;
    }
  }
  if (cur_tris) {
    groups++;
    tris += cur_tris;
  }
  out[0] = tris;
  out[1] = groups;
  // every flushed group stores one (possibly duplicate) name copy
  out[2] = mat_bytes + groups;
  out[3] = mtllib_bytes;
  out[4] = 0;
  out[5] = 0;
  return 0;
}

int64_t rt_obj_parse(const char *path, float *tri_pos, float *tri_nrm,
                     float *tri_uv, int32_t *group_start,
                     uint8_t *group_smooth, int64_t *group_mat_off,
                     char *mat_buf, char *mtllib_buf) {
  std::vector<char> buf;
  if (!read_file(path, buf)) return -1;
  Scanner sc(buf.data(), buf.size());
  Line l;

  std::vector<float> vx, vy, vz, tu, tv, nx, ny, nz;
  std::vector<Corner> tri_corners;  // 3 per accumulated triangle
  std::vector<Corner> corners;

  int64_t n_groups = 0, n_tris_out = 0, mat_pos = 0;
  std::string cur_mat;
  bool have_mat = false;
  bool cur_smooth = false;
  mtllib_buf[0] = '\0';

  auto flush_group = [&]() -> bool {
    size_t t = tri_corners.size() / 3;
    if (!t) return true;
    for (size_t i = 0; i < t; i++) {
      float p[3][3];
      for (int j = 0; j < 3; j++) {
        const Corner &c = tri_corners[3 * i + j];
        int64_t vi = c.v;
        // malformed indices: bail so the caller falls back to the
        // Python parser (which raises a proper IndexError)
        if (vi < 0 || vi >= (int64_t)vx.size()) return false;
        if (c.t >= (int64_t)tu.size() || c.n >= (int64_t)nx.size())
          return false;
        p[j][0] = vx[vi];
        p[j][1] = vy[vi];
        p[j][2] = vz[vi];
        float *pp = tri_pos + ((n_tris_out + i) * 3 + j) * 3;
        pp[0] = p[j][0];
        pp[1] = p[j][1];
        pp[2] = p[j][2];
        float *uu = tri_uv + ((n_tris_out + i) * 3 + j) * 2;
        if (c.t >= 0) {
          uu[0] = tu[c.t];
          uu[1] = tv[c.t];
        } else {
          uu[0] = uu[1] = 0.0f;
        }
        float *np_ = tri_nrm + ((n_tris_out + i) * 3 + j) * 3;
        if (c.n >= 0) {
          np_[0] = nx[c.n];
          np_[1] = ny[c.n];
          np_[2] = nz[c.n];
        } else {
          np_[0] = np_[1] = np_[2] = 0.0f;
        }
      }
      if (tri_corners[3 * i].n < 0) {
        // geometric fallback, keyed on the FIRST corner like the Python
        float e1[3] = {p[1][0] - p[0][0], p[1][1] - p[0][1],
                       p[1][2] - p[0][2]};
        float e2[3] = {p[2][0] - p[0][0], p[2][1] - p[0][1],
                       p[2][2] - p[0][2]};
        float g[3] = {e1[1] * e2[2] - e1[2] * e2[1],
                      e1[2] * e2[0] - e1[0] * e2[2],
                      e1[0] * e2[1] - e1[1] * e2[0]};
        // match numpy: norm in f64, divide in f64, narrow to f32
        double ln = std::sqrt(double(g[0]) * g[0] + double(g[1]) * g[1] +
                              double(g[2]) * g[2]);
        float gg[3];
        if (ln > 0) {
          gg[0] = float(g[0] / ln);
          gg[1] = float(g[1] / ln);
          gg[2] = float(g[2] / ln);
        } else {
          gg[0] = g[0];
          gg[1] = g[1];
          gg[2] = g[2];
        }
        for (int j = 0; j < 3; j++) {
          float *np_ = tri_nrm + ((n_tris_out + i) * 3 + j) * 3;
          np_[0] = gg[0];
          np_[1] = gg[1];
          np_[2] = gg[2];
        }
      }
    }
    group_start[n_groups] = static_cast<int32_t>(n_tris_out);
    group_smooth[n_groups] = cur_smooth ? 1 : 0;
    if (have_mat) {
      group_mat_off[n_groups] = mat_pos;
      memcpy(mat_buf + mat_pos, cur_mat.data(), cur_mat.size());
      mat_buf[mat_pos + cur_mat.size()] = '\0';
      mat_pos += cur_mat.size() + 1;
    } else {
      group_mat_off[n_groups] = -1;
    }
    n_groups++;
    n_tris_out += t;
    tri_corners.clear();
    return true;
  };

  while (sc.next(l)) {
    if (tag_is(l, "v")) {
      char *q = const_cast<char *>(l.rest);
      float a = pyf32(q, &q), b = pyf32(q, &q), c = pyf32(q, &q);
      vx.push_back(a);
      vy.push_back(b);
      vz.push_back(c);
    } else if (tag_is(l, "vt")) {
      char *q = const_cast<char *>(l.rest);
      char *q0 = q;
      float a = pyf32(q, &q);
      const char *after = skip_ws(q, l.end);
      float b = (q != q0 && after < l.end) ? pyf32(q, &q) : 0.0f;
      tu.push_back(a);
      tv.push_back(b);
    } else if (tag_is(l, "vn")) {
      char *q = const_cast<char *>(l.rest);
      float a = pyf32(q, &q), b = pyf32(q, &q), c = pyf32(q, &q);
      nx.push_back(a);
      ny.push_back(b);
      nz.push_back(c);
    } else if (tag_is(l, "f")) {
      parse_corners(l, (int64_t)vx.size(), (int64_t)tu.size(),
                    (int64_t)nx.size(), corners);
      for (size_t k = 1; k + 1 < corners.size(); k++) {
        tri_corners.push_back(corners[0]);
        tri_corners.push_back(corners[k]);
        tri_corners.push_back(corners[k + 1]);
      }
    } else if (tag_is(l, "usemtl")) {
      const char *b = l.rest, *e = l.end;
      strip_span(b, e);
      if (!have_mat && tri_corners.empty()) {
        cur_mat.assign(b, e - b);
        have_mat = true;
      } else {
        if (!flush_group()) return -2;
        cur_mat.assign(b, e - b);
        have_mat = true;
        cur_smooth = false;  // reference resets per group (:1002)
      }
    } else if (tag_is(l, "s")) {
      const char *b = skip_ws(l.rest, l.end);
      const char *e = token_end(b, l.end);
      size_t len = e - b;
      cur_smooth = !((len == 1 && b[0] == '0') ||
                     (len == 3 && memcmp(b, "off", 3) == 0));
    } else if (tag_is(l, "mtllib")) {
      const char *b = l.rest, *e = l.end;
      strip_span(b, e);
      memcpy(mtllib_buf, b, e - b);
      mtllib_buf[e - b] = '\0';
    }
  }
  if (!flush_group()) return -2;
  group_start[n_groups] = static_cast<int32_t>(n_tris_out);
  return n_groups;
}

}  // extern "C"
