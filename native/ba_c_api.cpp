// C API for the BAOptimizer facade — the embedding surface of the
// reference's ba_interface_example (reference
// include/ba_interface_example/BAOptimizer.h:127-135: BAOptimizer_Create /
// Add_CamVertex / Add_XYZVertex / Add_P2C3DEdge / Optimize / Dump_State...).
//
// The TPU build's optimizer lives in Python/JAX, so the C shim embeds the
// CPython interpreter and drives slam_plus_plus_tpu.app.ba_optimizer —
// a C or C++ host links libspp_ba_c.so and never sees Python.  Build:
//   make -C native libspp_ba_c.so
// (uses python3-config for the embed flags; see native/Makefile).

#include <Python.h>

#include <cstdio>
#include <cstdlib>

namespace {

struct BAHandle {
    PyObject *opt;   // slam_plus_plus_tpu.app.ba_optimizer.BAOptimizer
};

bool ensure_python() {
    if (Py_IsInitialized())
        return true;
    Py_Initialize();
    // repo root on sys.path so the package imports from a plain checkout;
    // JAX_PLATFORMS=cpu is honored in-process (site hooks may register
    // accelerator backends whose env overrides do not stick)
    PyRun_SimpleString(
        "import sys, os\n"
        "root = os.environ.get('SLAMPP_ROOT', os.getcwd())\n"
        "sys.path.insert(0, root)\n"
        "if os.environ.get('JAX_PLATFORMS', '') == 'cpu':\n"
        "    import jax\n"
        "    jax.config.update('jax_platforms', 'cpu')\n"
        "    jax.config.update('jax_enable_x64', True)\n");
    return Py_IsInitialized();
}

PyObject *call(PyObject *obj, const char *name, PyObject *args) {
    PyObject *fn = PyObject_GetAttrString(obj, name);
    if (!fn) {
        PyErr_Print();
        Py_XDECREF(args);
        return nullptr;
    }
    PyObject *out = PyObject_CallObject(fn, args);
    Py_DECREF(fn);
    Py_XDECREF(args);
    if (!out)
        PyErr_Print();
    return out;
}

PyObject *double_list(const double *v, int n) {
    PyObject *lst = PyList_New(n);
    for (int i = 0; i < n; ++i)
        PyList_SetItem(lst, i, PyFloat_FromDouble(v[i]));
    return lst;
}

}  // namespace

extern "C" {

// mirrors BAOptimizer_Create (BAOptimizer.h:127)
void *ba_optimizer_create(int use_schur) {
    if (!ensure_python())
        return nullptr;
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *mod = PyImport_ImportModule(
        "slam_plus_plus_tpu.app.ba_optimizer");
    if (!mod) {
        PyErr_Print();
        PyGILState_Release(g);
        return nullptr;
    }
    PyObject *cls = PyObject_GetAttrString(mod, "BAOptimizer");
    Py_DECREF(mod);
    PyObject *args = Py_BuildValue("(i)", use_schur ? 1 : 0);
    PyObject *opt = PyObject_CallObject(cls, args);
    Py_DECREF(cls);
    Py_DECREF(args);
    if (!opt) {
        PyErr_Print();
        PyGILState_Release(g);
        return nullptr;
    }
    BAHandle *h = new BAHandle{opt};
    PyGILState_Release(g);
    return h;
}

void ba_optimizer_destroy(void *hv) {
    if (!hv)
        return;
    BAHandle *h = static_cast<BAHandle *>(hv);
    PyGILState_STATE g = PyGILState_Ensure();
    Py_XDECREF(h->opt);
    PyGILState_Release(g);
    delete h;
}

// mirrors BAOptimizer_Add_XYZVertex
int ba_optimizer_add_xyz_vertex(void *hv, long id, const double xyz[3]) {
    BAHandle *h = static_cast<BAHandle *>(hv);
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *out = call(h->opt, "add_xyz_vertex",
                         Py_BuildValue("(lN)", id, double_list(xyz, 3)));
    int ok = out != nullptr;
    Py_XDECREF(out);
    PyGILState_Release(g);
    return ok;
}

// mirrors BAOptimizer_Add_CamVertex (g2o VERTEX_CAM layout:
// pos3 + quat_xyzw + fx fy cx cy d)
int ba_optimizer_add_cam_vertex(void *hv, long id, const double pos3[3],
                                const double quat_xyzw[4],
                                const double intrinsics5[5]) {
    BAHandle *h = static_cast<BAHandle *>(hv);
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *out = call(
        h->opt, "add_cam_vertex_g2o",
        Py_BuildValue("(lNNddddd)", id, double_list(pos3, 3),
                      double_list(quat_xyzw, 4), intrinsics5[0],
                      intrinsics5[1], intrinsics5[2], intrinsics5[3],
                      intrinsics5[4]));
    int ok = out != nullptr;
    Py_XDECREF(out);
    PyGILState_Release(g);
    return ok;
}

// mirrors BAOptimizer_Add_P2C3DEdge (info is row-major 2x2)
int ba_optimizer_add_p2c_edge(void *hv, long point_id, long cam_id,
                              const double uv[2], const double info2x2[4]) {
    BAHandle *h = static_cast<BAHandle *>(hv);
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *info = PyList_New(2);
    PyList_SetItem(info, 0, double_list(info2x2, 2));
    PyList_SetItem(info, 1, double_list(info2x2 + 2, 2));
    PyObject *out = call(h->opt, "add_p2c_edge",
                         Py_BuildValue("(llNN)", point_id, cam_id,
                                       double_list(uv, 2), info));
    int ok = out != nullptr;
    Py_XDECREF(out);
    PyGILState_Release(g);
    return ok;
}

// mirrors BAOptimizer_Optimize; returns the final chi2 (or -1 on error)
double ba_optimizer_optimize(void *hv, int max_iterations) {
    BAHandle *h = static_cast<BAHandle *>(hv);
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *out = call(h->opt, "optimize",
                         Py_BuildValue("(i)", max_iterations));
    double chi2 = -1.0;
    if (out) {
        // optimize() returns (chi2, iters)
        PyObject *c = PySequence_GetItem(out, 0);
        if (c) {
            chi2 = PyFloat_AsDouble(c);
            Py_DECREF(c);
        }
        Py_DECREF(out);
    }
    PyGILState_Release(g);
    return chi2;
}

double ba_optimizer_chi2(void *hv) {
    BAHandle *h = static_cast<BAHandle *>(hv);
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *out = call(h->opt, "chi2", PyTuple_New(0));
    double chi2 = out ? PyFloat_AsDouble(out) : -1.0;
    Py_XDECREF(out);
    PyGILState_Release(g);
    return chi2;
}

// copies a vertex state into out (size n); returns the copied length
int ba_optimizer_vertex_state(void *hv, long id, double *out_buf, int n) {
    BAHandle *h = static_cast<BAHandle *>(hv);
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *out = call(h->opt, "vertex_state", Py_BuildValue("(l)", id));
    int m = 0;
    if (out) {
        PyObject *seq = PySequence_Fast(out, "state");
        if (seq) {
            m = (int)PySequence_Fast_GET_SIZE(seq);
            if (m > n)
                m = n;
            for (int i = 0; i < m; ++i)
                out_buf[i] = PyFloat_AsDouble(
                    PySequence_Fast_GET_ITEM(seq, i));
            Py_DECREF(seq);
        }
        Py_DECREF(out);
    }
    PyGILState_Release(g);
    return m;
}

// mirrors BAOptimizer_Dump_State
int ba_optimizer_dump_state(void *hv, const char *path) {
    BAHandle *h = static_cast<BAHandle *>(hv);
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *out = call(h->opt, "dump_state", Py_BuildValue("(s)", path));
    int ok = out != nullptr;
    Py_XDECREF(out);
    PyGILState_Release(g);
    return ok;
}

}  // extern "C"
