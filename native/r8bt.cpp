/* r8bt.cpp — native float64 streaming engine for r8brain_tpu plans.
 *
 * Executes the stage chain planned by r8brain_tpu.models.plan from each
 * stage's *content formula* (the same executable specification the CPU
 * oracle implements, models/oracle.py), with streaming emission conditions
 * matching models/lengths.py exactly.  Structure is stage objects holding a
 * trimmed absolute-indexed history — the explicit-carry replacement for the
 * reference's ring buffers (see SURVEY.md §5).
 */

#include "r8bt.h"

#include <cmath>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Reader {
    const uint8_t *p;
    size_t left;
    bool ok = true;

    template <typename T>
    T get() {
        T v{};
        if (left < sizeof(T)) {
            ok = false;
            return v;
        }
        std::memcpy(&v, p, sizeof(T));
        p += sizeof(T);
        left -= sizeof(T);
        return v;
    }

    // A count read from the blob is only trusted if that many doubles can
    // still follow in the remaining bytes: a negative or huge count from a
    // truncated/corrupted blob must fail the parse (NULL return per
    // r8bt.h), not throw length_error/bad_alloc out of extern "C".
    bool validCount(int64_t n) {
        if (n < 0 || (uint64_t)n > left / sizeof(double)) ok = false;
        return ok;
    }

    bool getArray(double *dst, size_t n) {
        if (left < n * sizeof(double)) {
            ok = false;
            return false;
        }
        std::memcpy(dst, p, n * sizeof(double));
        p += n * sizeof(double);
        left -= n * sizeof(double);
        return true;
    }
};

/* History buffer with absolute indexing and left zero-extension. */
class Hist {
  public:
    void clear() {
        buf.clear();
        start = 0;
    }
    void push(const double *x, long n) { buf.insert(buf.end(), x, x + n); }
    /* sample at absolute index i (zero before stream start) */
    double at(long i) const {
        long j = i - start;
        if (j < 0 || (size_t)j >= buf.size()) return 0.0;
        return buf[(size_t)j];
    }
    void trimTo(long keep) {
        long drop = (long)buf.size() - keep;
        if (drop > 0) {
            buf.erase(buf.begin(), buf.begin() + drop);
            start += drop;
        }
    }

  private:
    std::vector<double> buf;
    long start = 0;
};

class Stage {
  public:
    virtual ~Stage() = default;
    virtual void clear() {
        nIn = 0;
        nOut = 0;
        hist.clear();
        skipLeft = inSkipInit();
    }
    virtual long inSkipInit() const { return 0; }
    virtual long availOut() const = 0;   /* outputs computable from nIn */
    virtual long inForOut(long m) const = 0;
    virtual void emit(double *out, long n0, long n1) = 0;
    virtual long keepHist() const = 0;

    long process(const double *x, long n, std::vector<double> &out) {
        if (skipLeft > 0) {
            long d = skipLeft < n ? skipLeft : n;
            x += d;
            n -= d;
            skipLeft -= d;
        }
        if (n > 0) {
            hist.push(x, n);
            nIn += n;
        }
        long avail = availOut();
        long cnt = avail - nOut;
        if (cnt <= 0) return 0;
        out.resize((size_t)cnt);
        emit(out.data(), nOut, avail);
        nOut = avail;
        hist.trimTo(keepHist());
        return cnt;
    }

  protected:
    Hist hist;
    long nIn = 0;
    long nOut = 0;
    long skipLeft = 0;
};

/* y[r] = sum_m k[m] u[r*down+off - m], u = zero-stuffed input
 * (polyphase evaluation; CDSPBlockConvolver content semantics). */
class ConvStage : public Stage {
  public:
    long up = 1, down = 1, off = 0, K = 0;
    std::vector<double> k;

    long availOut() const override {
        long t = nIn * up - 1 - off;
        return t >= 0 ? t / down + 1 : 0;
    }
    long inForOut(long m) const override {
        if (m <= 0) return 0;
        return ((m - 1) * down + off) / up + 1;
    }
    long keepHist() const override { return K / up + down + 8; }
    void emit(double *out, long n0, long n1) override {
        for (long r = n0; r < n1; ++r) {
            long t = r * down + off;
            long phase = (long)(t % up);
            long nhi = t / up;
            double acc = 0.0;
            /* taps k[phase + j*up] against x[nhi - j] */
            for (long m = phase, j = 0; m < K; m += up, ++j)
                acc += k[(size_t)m] * hist.at(nhi - j);
            out[r - n0] = acc;
        }
    }
};

/* y[2n] = x[n]; y[2n+1] = sum taps[i]*(x[n+1+i]+x[n-i]); drop outLat. */
class HBUpStage : public Stage {
  public:
    long nt = 0, outLat = 0;
    std::vector<double> taps;

    long availOut() const override {
        long v = 2 * (nIn - nt) - outLat;
        return v > 0 ? v : 0;
    }
    long inForOut(long m) const override {
        if (m <= 0) return 0;
        return (m + outLat + 1) / 2 + nt;
    }
    long keepHist() const override { return 2 * nt + 8; }
    void emit(double *out, long n0, long n1) override {
        for (long s = n0 + outLat; s < n1 + outLat; ++s) {
            long n = s / 2;
            double v;
            if ((s & 1) == 0) {
                v = hist.at(n);
            } else {
                v = 0.0;
                for (long i = 0; i < nt; ++i)
                    v += taps[(size_t)i] *
                         (hist.at(n + 1 + i) + hist.at(n - i));
            }
            out[s - outLat - n0] = v;
        }
    }
};

/* y[n] = x[2n] + sum taps[i]*(x[2n+1+2i]+x[2n-1-2i]); drop outLat. */
class HBDownStage : public Stage {
  public:
    long nt = 0, outLat = 0;
    std::vector<double> taps;

    long availOut() const override {
        long d = nIn - 2 * nt;
        if (d < 0) return 0;  /* C++ '/' truncates toward zero; the
                                 emission algebra (models/lengths.py) uses
                                 floor division */
        long v = d / 2 + 1 - outLat;
        return v > 0 ? v : 0;
    }
    long inForOut(long m) const override {
        if (m <= 0) return 0;
        return 2 * (m + outLat - 1) + 2 * nt;
    }
    long keepHist() const override { return 4 * nt + 8; }
    void emit(double *out, long n0, long n1) override {
        for (long n = n0 + outLat; n < n1 + outLat; ++n) {
            double v = hist.at(2 * n);
            for (long i = 0; i < nt; ++i)
                v += taps[(size_t)i] *
                     (hist.at(2 * n + 1 + 2 * i) + hist.at(2 * n - 1 - 2 * i));
            out[n - outLat - n0] = v;
        }
    }
};

/* Whole-stepping fractional interpolator (CDSPFracInterpolator whole mode). */
class FracWholeStage : public Stage {
  public:
    long inStep = 0, outStep = 0, w0 = 0, inLat = 0, fl = 0;
    std::vector<double> table; /* [outStep][fl] */

    long inSkipInit() const override { return inLat; }
    long fl2() const { return fl / 2; }
    long availOut() const override {
        long lim = nIn - fl2() - 1;
        if (lim < 0) return 0;
        return ((lim + 1) * outStep - 1 - w0) / inStep + 1;
    }
    long inForOut(long m) const override {
        if (m <= 0) return 0;
        long g = w0 + (m - 1) * inStep;
        return inLat + g / outStep + fl2() + 1;
    }
    long keepHist() const override {
        return fl + inStep / outStep + 16;
    }
    void emit(double *out, long n0, long n1) override {
        long fll = fl2() - 1;
        for (long n = n0; n < n1; ++n) {
            long g = w0 + n * inStep;
            long s = g / outStep;
            long f = g % outStep;
            const double *flt = &table[(size_t)(f * fl)];
            double acc = 0.0;
            for (long i = 0; i < fl; ++i)
                acc += flt[i] * hist.at(s - fll + i);
            out[n - n0] = acc;
        }
    }
};

/* Polynomial-mode fractional interpolator: resettable-counter timing
 * (CDSPFracInterpolator.h:907-919), spline filter evaluation. */
class FracPolyStage : public Stage {
  public:
    double srcRate = 0, dstRate = 0, initFracPos = 0;
    long inLat = 0, fl = 0, fracs = 0, rows = 0;
    std::vector<double> table; /* [rows][fl][3] */

    long inSkipInit() const override { return inLat; }
    long fl2() const { return fl / 2; }
    double posOf(long n) const {
        if (n == 0) return initFracPos;
        double shift = initFracPos * dstRate / srcRate;
        return ((double)n + shift) * (srcRate / dstRate);
    }
    long availOut() const override {
        long lim = nIn - fl2() - 1;
        if (lim < 0) return 0;
        double r = srcRate / dstRate;
        double shift = initFracPos * dstRate / srcRate;
        long n = (long)std::floor(((double)lim + 1.0) / r - shift);
        while ((long)std::floor(posOf(n)) > lim) --n;
        while ((long)std::floor(posOf(n + 1)) <= lim) ++n;
        return n + 1 > 0 ? n + 1 : 0;
    }
    long inForOut(long m) const override {
        if (m <= 0) return 0;
        long s = (long)std::floor(posOf(m - 1));
        return inLat + s + fl2() + 1;
    }
    long keepHist() const override {
        return fl + (long)std::ceil(srcRate / dstRate) + 16;
    }
    void emit(double *out, long n0, long n1) override {
        long fll = fl2() - 1;
        for (long n = n0; n < n1; ++n) {
            double p = posOf(n);
            long s = (long)std::floor(p);
            double fr = (p - (double)s) * (double)fracs;
            long fi = (long)std::floor(fr);
            double t = fr - (double)fi;
            const double *row = &table[(size_t)(fi * fl * 3)];
            double acc = 0.0;
            for (long i = 0; i < fl; ++i) {
                const double *c = row + i * 3;
                acc += (c[0] + (c[1] + c[2] * t) * t) * hist.at(s - fll + i);
            }
            out[n - n0] = acc;
        }
    }
};

struct Engine {
    double srcRate = 0, dstRate = 0, latencyFrac = 0;
    std::vector<Stage *> stages;
    std::vector<double> bufA, bufB;

    ~Engine() {
        for (auto *s : stages) delete s;
    }
    void clear() {
        for (auto *s : stages) s->clear();
    }
    long process(const double *in, long n, double **out) {
        bufA.assign(in, in + n);
        std::vector<double> *cur = &bufA, *nxt = &bufB;
        for (auto *s : stages) {
            long m = s->process(cur->data(), (long)cur->size(), *nxt);
            nxt->resize((size_t)m);
            std::swap(cur, nxt);
        }
        *out = cur->data();
        return (long)cur->size();
    }
    long inForOut(long m) const {
        for (auto it = stages.rbegin(); it != stages.rend(); ++it)
            m = (*it)->inForOut(m);
        return m;
    }
};

Engine *parseBlob(const void *blob, size_t len) {
    Reader rd{(const uint8_t *)blob, len};
    char magic[4];
    for (int i = 0; i < 4; ++i) magic[i] = (char)rd.get<uint8_t>();
    if (!rd.ok || std::memcmp(magic, "R8BT", 4) != 0) return nullptr;
    uint32_t ver = rd.get<uint32_t>();
    if (ver != 1) return nullptr;
    Engine *e = new Engine();
    e->srcRate = rd.get<double>();
    e->dstRate = rd.get<double>();
    e->latencyFrac = rd.get<double>();
    uint32_t ns = rd.get<uint32_t>();
    for (uint32_t i = 0; i < ns && rd.ok; ++i) {
        uint32_t kind = rd.get<uint32_t>();
        if (kind == 0) {
            auto *s = new ConvStage();
            s->up = rd.get<int64_t>();
            s->down = rd.get<int64_t>();
            s->off = rd.get<int64_t>();
            s->K = rd.get<int64_t>();
            if (s->up <= 0 || s->down <= 0 || !rd.validCount(s->K)) {
                delete s;
                rd.ok = false;
                break;
            }
            s->k.resize((size_t)s->K);
            rd.getArray(s->k.data(), (size_t)s->K);
            e->stages.push_back(s);
        } else if (kind == 1 || kind == 2) {
            long nt = rd.get<int64_t>();
            long lat = rd.get<int64_t>();
            if (lat < 0 || !rd.validCount(nt)) {
                rd.ok = false;
                break;
            }
            if (kind == 1) {
                auto *s = new HBUpStage();
                s->nt = nt;
                s->outLat = lat;
                s->taps.resize((size_t)nt);
                rd.getArray(s->taps.data(), (size_t)nt);
                e->stages.push_back(s);
            } else {
                auto *s = new HBDownStage();
                s->nt = nt;
                s->outLat = lat;
                s->taps.resize((size_t)nt);
                rd.getArray(s->taps.data(), (size_t)nt);
                e->stages.push_back(s);
            }
        } else if (kind == 3) {
            auto *s = new FracWholeStage();
            s->inStep = rd.get<int64_t>();
            s->outStep = rd.get<int64_t>();
            s->w0 = rd.get<int64_t>();
            s->inLat = rd.get<int64_t>();
            s->fl = rd.get<int64_t>();
            if (s->inStep <= 0 || s->outStep <= 0 || s->inLat < 0 ||
                s->fl <= 0 || s->outStep > (1 << 20) || s->fl > (1 << 20) ||
                !rd.validCount(s->outStep * s->fl)) {
                delete s;
                rd.ok = false;
                break;
            }
            s->table.resize((size_t)(s->outStep * s->fl));
            rd.getArray(s->table.data(), s->table.size());
            e->stages.push_back(s);
        } else if (kind == 4) {
            auto *s = new FracPolyStage();
            s->srcRate = rd.get<double>();
            s->dstRate = rd.get<double>();
            s->initFracPos = rd.get<double>();
            s->inLat = rd.get<int64_t>();
            s->fl = rd.get<int64_t>();
            s->fracs = rd.get<int64_t>();
            s->rows = rd.get<int64_t>();
            if (s->inLat < 0 || s->fl <= 0 || s->fracs <= 0 ||
                s->rows <= 0 || s->rows > (1 << 20) || s->fl > (1 << 20) ||
                !rd.validCount(s->rows * s->fl * 3)) {
                delete s;
                rd.ok = false;
                break;
            }
            s->table.resize((size_t)(s->rows * s->fl * 3));
            rd.getArray(s->table.data(), s->table.size());
            e->stages.push_back(s);
        } else {
            rd.ok = false;
        }
    }
    if (!rd.ok) {
        delete e;
        return nullptr;
    }
    e->clear();
    return e;
}

} // namespace

extern "C" {

r8bt_handle r8bt_create_from_blob(const void *blob, size_t len) {
    if (!blob) return nullptr;
    try {
        return (r8bt_handle)parseBlob(blob, len);
    } catch (...) {  // keep the NULL-on-parse-failure ABI contract
        return nullptr;
    }
}

void r8bt_delete(r8bt_handle h) { delete (Engine *)h; }

void r8bt_clear(r8bt_handle h) { ((Engine *)h)->clear(); }

long r8bt_process(r8bt_handle h, const double *in, long in_len,
                  double **out) {
    if (!h || in_len < 0) return -1;
    return ((Engine *)h)->process(in, in_len, out);
}

long r8bt_in_required_for_out(r8bt_handle h, long out_count) {
    if (!h) return -1;
    return ((Engine *)h)->inForOut(out_count);
}

double r8bt_latency_frac(r8bt_handle h) {
    return h ? ((Engine *)h)->latencyFrac : 0.0;
}

const char *r8bt_version(void) { return "r8bt-1.0"; }

} // extern "C"
