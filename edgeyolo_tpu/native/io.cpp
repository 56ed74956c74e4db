// edgeyolo_tpu native IO: threaded JPEG decode + letterbox for the training
// input pipeline.
//
// The reference delegates image IO to OpenCV (cv2.imread + cv2.resize inside
// BaseDataset.load_image, reference data/base.py:151). This module is the
// TPU-framework equivalent of that native dependency, owned: libjpeg decode
// with DCT-domain prescaling (decode at 1/2, 1/4, 1/8 when downscaling —
// most of the resize cost disappears inside the entropy decoder), exact
// letterbox semantics matching data/letterbox.py (ratio-preserving bilinear
// resize, gray-114 pad split half/half with the reference's round(d ± 0.1)
// rule), and a GIL-released thread pool for batch decode.
//
// Exposed via the raw CPython C API (no pybind11 in this image):
//   decode_letterbox(bytes, imgsz, scaleup) -> (buf, h0, w0, r, pw, ph)
//   decode_letterbox_batch([bytes], imgsz, scaleup, threads)
//       -> (buf B*S*S*3, [(h0, w0, r, pw, ph), ...])
// Buffers are Python bytes of uint8 RGB; the Python wrapper views them as
// numpy arrays without copying (np.frombuffer).

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <jpeglib.h>
#include <setjmp.h>

#include <cmath>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct JErr {
  jpeg_error_mgr mgr;
  jmp_buf jmp;
  char msg[JMSG_LENGTH_MAX];
};

void jerr_exit(j_common_ptr cinfo) {
  JErr* e = reinterpret_cast<JErr*>(cinfo->err);
  (*cinfo->err->format_message)(cinfo, e->msg);
  longjmp(e->jmp, 1);
}

struct Decoded {
  std::vector<unsigned char> rgb;  // h*w*3
  int h = 0, w = 0;                // decoded dims (after DCT prescale)
  int h0 = 0, w0 = 0;              // original dims
  bool ok = false;
  std::string err;
};

// Decode a JPEG from memory. If target > 0, use DCT scaling to decode at the
// smallest scale >= the letterbox size (cheap downscale inside the decoder).
Decoded decode_jpeg(const unsigned char* buf, size_t len, int target) {
  Decoded out;
  jpeg_decompress_struct cinfo;
  JErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jerr_exit;
  if (setjmp(jerr.jmp)) {
    out.err = jerr.msg;
    jpeg_destroy_decompress(&cinfo);
    return out;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<unsigned char*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  out.h0 = cinfo.image_height;
  out.w0 = cinfo.image_width;
  cinfo.out_color_space = JCS_RGB;
  if (target > 0) {
    // pick denom in {1,2,4,8}: decoded long side keeps >= 2x the resize
    // target so the triangle filter still antialiases (matches the PIL
    // full-decode + BILINEAR pipeline within rounding)
    int long_side = out.h0 > out.w0 ? out.h0 : out.w0;
    int denom = 1;
    while (denom < 8 && long_side / (denom * 2) >= 2 * target) denom *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  jpeg_start_decompress(&cinfo);
  out.h = cinfo.output_height;
  out.w = cinfo.output_width;
  out.rgb.resize(static_cast<size_t>(out.h) * out.w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = out.rgb.data() + static_cast<size_t>(cinfo.output_scanline) * out.w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  out.ok = true;
  return out;
}

// Separable triangle-filter resize (RGB u8) with support scaled by the
// downscale ratio — PIL's BILINEAR semantics (antialiased on downscale,
// 2-tap on upscale), so the native path matches data/letterbox.py pixels.
struct Taps {
  std::vector<int> start;     // first source index per output pixel
  std::vector<int> count;     // tap count per output pixel
  std::vector<float> weight;  // flattened weights, max_taps stride
  int max_taps = 0;
};

Taps make_taps(int src_n, int dst_n) {
  Taps t;
  double scale = static_cast<double>(src_n) / dst_n;
  double support = scale > 1.0 ? scale : 1.0;  // triangle radius
  t.max_taps = static_cast<int>(std::ceil(support)) * 2 + 1;
  t.start.resize(dst_n);
  t.count.resize(dst_n);
  t.weight.assign(static_cast<size_t>(dst_n) * t.max_taps, 0.f);
  for (int i = 0; i < dst_n; ++i) {
    double center = (i + 0.5) * scale;
    int lo = static_cast<int>(std::floor(center - support + 0.5));
    int hi = static_cast<int>(std::floor(center + support + 0.5));
    if (lo < 0) lo = 0;
    if (hi > src_n) hi = src_n;
    double total = 0.0;
    for (int j = lo; j < hi; ++j) {
      double d = (j + 0.5 - center) / (scale > 1.0 ? scale : 1.0);
      double w = d < 0 ? 1.0 + d : 1.0 - d;
      if (w < 0) w = 0;
      t.weight[static_cast<size_t>(i) * t.max_taps + (j - lo)] = static_cast<float>(w);
      total += w;
    }
    if (total > 0) {
      for (int j = 0; j < hi - lo; ++j)
        t.weight[static_cast<size_t>(i) * t.max_taps + j] /= static_cast<float>(total);
    }
    t.start[i] = lo;
    t.count[i] = hi - lo;
  }
  return t;
}

void resize_bilinear(const unsigned char* src, int sh, int sw,
                     unsigned char* dst, int dh, int dw) {
  Taps tx = make_taps(sw, dw);
  Taps ty = make_taps(sh, dh);
  // horizontal pass into a float intermediate (sh x dw x 3)
  std::vector<float> mid(static_cast<size_t>(sh) * dw * 3);
  for (int y = 0; y < sh; ++y) {
    const unsigned char* row = src + static_cast<size_t>(y) * sw * 3;
    float* mrow = mid.data() + static_cast<size_t>(y) * dw * 3;
    for (int x = 0; x < dw; ++x) {
      float acc[3] = {0.f, 0.f, 0.f};
      int s = tx.start[x];
      const float* w = tx.weight.data() + static_cast<size_t>(x) * tx.max_taps;
      for (int j = 0; j < tx.count[x]; ++j) {
        const unsigned char* p = row + (static_cast<size_t>(s) + j) * 3;
        acc[0] += w[j] * p[0];
        acc[1] += w[j] * p[1];
        acc[2] += w[j] * p[2];
      }
      mrow[x * 3 + 0] = acc[0];
      mrow[x * 3 + 1] = acc[1];
      mrow[x * 3 + 2] = acc[2];
    }
  }
  // vertical pass
  for (int y = 0; y < dh; ++y) {
    unsigned char* drow = dst + static_cast<size_t>(y) * dw * 3;
    int s = ty.start[y];
    const float* w = ty.weight.data() + static_cast<size_t>(y) * ty.max_taps;
    for (int x = 0; x < dw * 3; ++x) {
      float acc = 0.f;
      for (int j = 0; j < ty.count[y]; ++j)
        acc += w[j] * mid[(static_cast<size_t>(s) + j) * dw * 3 + x];
      int v = static_cast<int>(acc + 0.5f);
      drow[x] = static_cast<unsigned char>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

struct Meta {
  int h0 = 0, w0 = 0;
  double r = 1.0;
  int pw = 0, ph = 0;
  bool ok = false;
  std::string err;
};

// Decode + letterbox one JPEG into out (imgsz*imgsz*3, pre-filled by caller
// or filled here with gray 114). Mirrors data/letterbox.py exactly.
Meta decode_letterbox_one(const unsigned char* buf, size_t len, int imgsz,
                          bool scaleup, unsigned char* out) {
  Meta m;
  Decoded d = decode_jpeg(buf, len, imgsz);
  if (!d.ok) {
    m.err = d.err;
    return m;
  }
  m.h0 = d.h0;
  m.w0 = d.w0;
  double r = std::min(static_cast<double>(imgsz) / d.h0,
                      static_cast<double>(imgsz) / d.w0);
  if (!scaleup && r > 1.0) r = 1.0;
  m.r = r;
  int nw = static_cast<int>(std::lround(d.w0 * r));
  int nh = static_cast<int>(std::lround(d.h0 * r));
  double dw = (imgsz - nw) / 2.0;
  double dh = (imgsz - nh) / 2.0;
  int left = static_cast<int>(std::lround(dw - 0.1));
  int top = static_cast<int>(std::lround(dh - 0.1));
  m.pw = left;
  m.ph = top;
  std::memset(out, 114, static_cast<size_t>(imgsz) * imgsz * 3);
  std::vector<unsigned char> tmp(static_cast<size_t>(nh) * nw * 3);
  const unsigned char* src = d.rgb.data();
  if (d.h == nh && d.w == nw) {
    tmp.assign(d.rgb.begin(), d.rgb.end());
  } else {
    resize_bilinear(src, d.h, d.w, tmp.data(), nh, nw);
  }
  for (int y = 0; y < nh; ++y) {
    std::memcpy(out + ((static_cast<size_t>(top) + y) * imgsz + left) * 3,
                tmp.data() + static_cast<size_t>(y) * nw * 3,
                static_cast<size_t>(nw) * 3);
  }
  m.ok = true;
  return m;
}

PyObject* meta_tuple(const Meta& m) {
  return Py_BuildValue("(iidii)", m.h0, m.w0, m.r, m.pw, m.ph);
}

PyObject* py_decode_letterbox(PyObject*, PyObject* args) {
  Py_buffer view;
  int imgsz;
  int scaleup = 1;
  if (!PyArg_ParseTuple(args, "y*i|p", &view, &imgsz, &scaleup)) return nullptr;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, static_cast<Py_ssize_t>(imgsz) * imgsz * 3);
  if (!out) {
    PyBuffer_Release(&view);
    return nullptr;
  }
  Meta m;
  Py_BEGIN_ALLOW_THREADS
  m = decode_letterbox_one(static_cast<const unsigned char*>(view.buf), view.len,
                           imgsz, scaleup != 0,
                           reinterpret_cast<unsigned char*>(PyBytes_AS_STRING(out)));
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&view);
  if (!m.ok) {
    Py_DECREF(out);
    PyErr_SetString(PyExc_ValueError, m.err.empty() ? "jpeg decode failed" : m.err.c_str());
    return nullptr;
  }
  PyObject* meta = meta_tuple(m);
  PyObject* res = PyTuple_Pack(2, out, meta);
  Py_DECREF(out);
  Py_DECREF(meta);
  return res;
}

PyObject* py_decode_letterbox_batch(PyObject*, PyObject* args) {
  PyObject* items;
  int imgsz;
  int scaleup = 1;
  int threads = 4;
  if (!PyArg_ParseTuple(args, "Oi|pi", &items, &imgsz, &scaleup, &threads)) return nullptr;
  if (!PyList_Check(items)) {
    PyErr_SetString(PyExc_TypeError, "expected a list of bytes");
    return nullptr;
  }
  Py_ssize_t n = PyList_GET_SIZE(items);
  std::vector<std::pair<const unsigned char*, size_t>> bufs(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* it = PyList_GET_ITEM(items, i);
    char* p;
    Py_ssize_t len;
    if (PyBytes_AsStringAndSize(it, &p, &len) < 0) return nullptr;
    bufs[i] = {reinterpret_cast<const unsigned char*>(p), static_cast<size_t>(len)};
  }
  size_t frame = static_cast<size_t>(imgsz) * imgsz * 3;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, static_cast<Py_ssize_t>(frame * n));
  if (!out) return nullptr;
  unsigned char* base = reinterpret_cast<unsigned char*>(PyBytes_AS_STRING(out));
  std::vector<Meta> metas(n);
  int nt = threads < 1 ? 1 : threads;
  if (nt > n) nt = static_cast<int>(n > 0 ? n : 1);
  Py_BEGIN_ALLOW_THREADS {
    std::vector<std::thread> pool;
    std::vector<Py_ssize_t> cursor(1, 0);
    for (int t = 0; t < nt; ++t) {
      pool.emplace_back([&, t]() {
        for (Py_ssize_t i = t; i < n; i += nt) {
          metas[i] = decode_letterbox_one(bufs[i].first, bufs[i].second, imgsz,
                                          scaleup != 0, base + frame * i);
        }
      });
    }
    for (auto& th : pool) th.join();
  }
  Py_END_ALLOW_THREADS
  PyObject* metas_py = PyList_New(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    if (!metas[i].ok) {
      Py_DECREF(out);
      Py_DECREF(metas_py);
      PyErr_Format(PyExc_ValueError, "jpeg decode failed at index %zd: %s", i,
                   metas[i].err.c_str());
      return nullptr;
    }
    PyList_SET_ITEM(metas_py, i, meta_tuple(metas[i]));
  }
  PyObject* res = PyTuple_Pack(2, out, metas_py);
  Py_DECREF(out);
  Py_DECREF(metas_py);
  return res;
}

PyMethodDef kMethods[] = {
    {"decode_letterbox", py_decode_letterbox, METH_VARARGS,
     "decode_letterbox(jpeg_bytes, imgsz, scaleup=True) -> (rgb_bytes, (h0, w0, r, pw, ph))"},
    {"decode_letterbox_batch", py_decode_letterbox_batch, METH_VARARGS,
     "decode_letterbox_batch([jpeg_bytes], imgsz, scaleup=True, threads=4)"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {PyModuleDef_HEAD_INIT, "_edgeyolo_io",
                       "native JPEG decode + letterbox", -1, kMethods};

}  // namespace

PyMODINIT_FUNC PyInit__edgeyolo_io(void) { return PyModule_Create(&kModule); }
