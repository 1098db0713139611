/* C-ABI embedding shim: hosts CPython and forwards the vsearch_api.h
 * session protocol (reference src/vsearch_api.h:60-124) to
 * vsearch_tpu.api.  See vsearch_tpu_api.h for the contract.
 *
 * Written from the protocol spec; no reference code copied. */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <string.h>

#include "vsearch_tpu_api.h"

static PyObject *g_api = NULL;      /* vsearch_tpu.api module */
static PyObject *g_params_mod = NULL;

typedef struct {
    PyObject *session;              /* api.SearchSession */
    PyObject *db;                   /* api.Database */
} search_handle_t;

static int report(const char *where)
{
    fprintf(stderr, "vsearch_tpu_capi: error in %s\n", where);
    if (PyErr_Occurred())
        PyErr_Print();
    return -1;
}

int vstpu_api_init(void)
{
    if (!Py_IsInitialized())
        Py_InitializeEx(0);
    PyGILState_STATE g = PyGILState_Ensure();
    int version = -1;
    if (g_api == NULL) {
        g_api = PyImport_ImportModule("vsearch_tpu.api");
        g_params_mod = PyImport_ImportModule("vsearch_tpu.params");
    }
    if (g_api == NULL || g_params_mod == NULL) {
        report("vstpu_api_init (is vsearch_tpu on PYTHONPATH?)");
        PyGILState_Release(g);
        return -1;
    }
    PyObject *v = PyObject_CallMethod(g_api, "api_version", NULL);
    if (v != NULL) {
        version = (int) PyLong_AsLong(v);
        Py_DECREF(v);
    } else {
        report("api_version");
    }
    PyGILState_Release(g);
    return version;
}

void vstpu_api_finalize(void)
{
    /* Leave the interpreter running: JAX runtimes do not survive
     * re-initialization, and the reference supports sequential sessions
     * in one process (vsearch_api.h "Re-initialization").  Drop module
     * refs only. */
    PyGILState_STATE g = PyGILState_Ensure();
    Py_CLEAR(g_api);
    Py_CLEAR(g_params_mod);
    PyGILState_Release(g);
}

void *vstpu_params_new(void)
{
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *p = PyObject_CallMethod(g_params_mod, "Parameters", NULL);
    if (p == NULL)
        report("vstpu_params_new");
    PyGILState_Release(g);
    return (void *) p;
}

static int params_set(void *params, const char *opt, PyObject *value)
{
    /* takes ownership of value */
    PyGILState_STATE g = PyGILState_Ensure();
    char name[128];
    int rc = 0;
    if (value == NULL) {
        PyGILState_Release(g);
        return report("params_set value");
    }
    snprintf(name, sizeof name, "opt_%s", opt);
    if (PyObject_SetAttrString((PyObject *) params, name, value) != 0)
        rc = report("vstpu_params_set");
    Py_DECREF(value);
    PyGILState_Release(g);
    return rc;
}

int vstpu_params_set_num(void *params, const char *opt, double value)
{
    PyGILState_STATE g = PyGILState_Ensure();
    /* integer-typed options receive ints (the Parameters dataclass
     * fields are int or float; match the current field's type) */
    char name[128];
    snprintf(name, sizeof name, "opt_%s", opt);
    PyObject *old = PyObject_GetAttrString((PyObject *) params, name);
    PyObject *v;
    if (old != NULL && PyLong_Check(old) && value == (double)(long long) value)
        v = PyLong_FromLongLong((long long) value);
    else
        v = PyFloat_FromDouble(value);
    Py_XDECREF(old);
    PyErr_Clear();
    PyGILState_Release(g);
    return params_set(params, opt, v);
}

int vstpu_params_set_str(void *params, const char *opt, const char *value)
{
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *v = PyUnicode_FromString(value);
    PyGILState_Release(g);
    return params_set(params, opt, v);
}

void vstpu_params_free(void *params)
{
    PyGILState_STATE g = PyGILState_Ensure();
    Py_XDECREF((PyObject *) params);
    PyGILState_Release(g);
}

int vstpu_session_begin(void *params)
{
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(g_api, "session_begin", "O",
                                      (PyObject *) params);
    int rc = r ? 0 : report("vstpu_session_begin");
    Py_XDECREF(r);
    PyGILState_Release(g);
    return rc;
}

int vstpu_session_end(void)
{
    PyGILState_STATE g = PyGILState_Ensure();
    PyObject *r = PyObject_CallMethod(g_api, "session_end", NULL);
    int rc = r ? 0 : report("vstpu_session_end");
    Py_XDECREF(r);
    PyGILState_Release(g);
    return rc;
}

void *vstpu_search_open(void *params, const char *db_path)
{
    PyGILState_STATE g = PyGILState_Ensure();
    search_handle_t *h = NULL;
    PyObject *pair = PyObject_CallMethod(g_api, "read_database", "sO",
                                         db_path, (PyObject *) params);
    if (pair == NULL) {
        report("read_database");
        goto out;
    }
    PyObject *db = PyTuple_GetItem(pair, 0);       /* borrowed */
    PyObject *index = PyTuple_GetItem(pair, 1);
    PyObject *sess = PyObject_CallMethod(g_api, "SearchSession", "OOO",
                                         (PyObject *) params, db, index);
    if (sess == NULL) {
        report("SearchSession");
        Py_DECREF(pair);
        goto out;
    }
    h = (search_handle_t *) malloc(sizeof *h);
    Py_INCREF(db);
    h->session = sess;
    h->db = db;
    Py_DECREF(pair);
out:
    PyGILState_Release(g);
    return (void *) h;
}

int vstpu_search_single(void *handle, const char *header,
                        const char *sequence, vstpu_hit_t *out, int cap)
{
    search_handle_t *h = (search_handle_t *) handle;
    PyGILState_STATE g = PyGILState_Ensure();
    int n = -1;
    PyObject *hits = PyObject_CallMethod(
        h->session, "search", "yy", header, sequence);
    if (hits == NULL) {
        report("search");
        goto out;
    }
    Py_ssize_t cnt = PyList_Size(hits);
    n = 0;
    for (Py_ssize_t i = 0; i < cnt && n < cap; i++) {
        PyObject *r = PyList_GetItem(hits, i);     /* borrowed */
        vstpu_hit_t *o = &out[n];
        memset(o, 0, sizeof *o);
#define GETL(field) PyLong_AsLong(PyObject_GetAttrString(r, field))
        PyObject *tmp;
        tmp = PyObject_GetAttrString(r, "target");
        o->target = PyLong_AsLong(tmp); Py_XDECREF(tmp);
        tmp = PyObject_GetAttrString(r, "id");
        o->id = PyFloat_AsDouble(tmp); Py_XDECREF(tmp);
        tmp = PyObject_GetAttrString(r, "matches");
        o->matches = PyLong_AsLong(tmp); Py_XDECREF(tmp);
        tmp = PyObject_GetAttrString(r, "mismatches");
        o->mismatches = PyLong_AsLong(tmp); Py_XDECREF(tmp);
        tmp = PyObject_GetAttrString(r, "gaps");
        o->gaps = PyLong_AsLong(tmp); Py_XDECREF(tmp);
        tmp = PyObject_GetAttrString(r, "alignment_length");
        o->alignment_length = PyLong_AsLong(tmp); Py_XDECREF(tmp);
        tmp = PyObject_GetAttrString(r, "query_length");
        o->query_length = PyLong_AsLong(tmp); Py_XDECREF(tmp);
        tmp = PyObject_GetAttrString(r, "target_length");
        o->target_length = PyLong_AsLong(tmp); Py_XDECREF(tmp);
        tmp = PyObject_GetAttrString(r, "strand");
        o->strand = (int) PyLong_AsLong(tmp); Py_XDECREF(tmp);
#undef GETL
        tmp = PyObject_GetAttrString(r, "cigar");
        if (tmp != NULL) {
            const char *c = PyUnicode_AsUTF8(tmp);
            if (c != NULL)
                snprintf(o->cigar, sizeof o->cigar, "%s", c);
            Py_DECREF(tmp);
        }
        PyObject *lbl = PyObject_CallMethod(h->db, "getheader", "l",
                                            o->target);
        if (lbl != NULL) {
            char *buf; Py_ssize_t len;
            if (PyBytes_AsStringAndSize(lbl, &buf, &len) == 0) {
                size_t m = (size_t) len < sizeof o->target_label - 1
                    ? (size_t) len : sizeof o->target_label - 1;
                memcpy(o->target_label, buf, m);
                o->target_label[m] = '\0';
            }
            Py_DECREF(lbl);
        }
        PyErr_Clear();
        n++;
    }
    Py_DECREF(hits);
out:
    PyGILState_Release(g);
    return n;
}

void vstpu_search_close(void *handle)
{
    search_handle_t *h = (search_handle_t *) handle;
    if (h == NULL)
        return;
    PyGILState_STATE g = PyGILState_Ensure();
    Py_XDECREF(h->session);
    Py_XDECREF(h->db);
    PyGILState_Release(g);
    free(h);
}

int vstpu_dust_single(const char *sequence, char *out, int cap)
{
    PyGILState_STATE g = PyGILState_Ensure();
    int n = -1;
    PyObject *r = PyObject_CallMethod(g_api, "dust_single", "y", sequence);
    if (r == NULL) {
        report("dust_single");
        goto done;
    }
    char *buf; Py_ssize_t len;
    if (PyBytes_AsStringAndSize(r, &buf, &len) == 0 && len < cap) {
        memcpy(out, buf, (size_t) len);
        out[len] = '\0';
        n = (int) len;
    }
    Py_DECREF(r);
done:
    PyGILState_Release(g);
    return n;
}
