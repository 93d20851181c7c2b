// slode_native: host-side runtime components in C++.
//
// The reference delegates its host runtime to pandas/torch DataLoader
// (SURVEY.md §2 C17); here the hot host paths are native:
//   1. plate-reader CSV ingestion (slode_proc_* C ABI) — the proc pipeline's
//      parse stage, threaded across files from Python (the GIL is released
//      during the call);
//   2. epoch packing (slode_pack_epoch) — permutation gather + padding that
//      builds the stacked (n_batches, B, ...) epoch tensors consumed by the
//      on-device lax.scan training loop.
//
// Exposed via a plain C ABI for ctypes (no pybind11 dependency).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

std::vector<std::string> split(const std::string& s, char delim) {
  std::vector<std::string> out;
  std::string cur;
  std::istringstream ss(s);
  while (std::getline(ss, cur, delim)) out.push_back(cur);
  if (!s.empty() && s.back() == delim) out.push_back("");
  return out;
}

std::string strip(const std::string& s) {
  size_t a = s.find_first_not_of(" \t\r\n");
  if (a == std::string::npos) return "";
  size_t b = s.find_last_not_of(" \t\r\n");
  return s.substr(a, b - a + 1);
}

// Signal name: text inside the first parentheses, else the whole header
// (mirrors data/proc.py::_extract_signal).
std::string extract_signal(const std::string& h) {
  size_t a = h.find('(');
  if (a != std::string::npos) {
    size_t b = h.find(')', a);
    if (b != std::string::npos) return h.substr(a + 1, b - a - 1);
  }
  return h;
}

struct ProcData {
  int64_t n_rows = 0;
  int64_t n_signals = 0;
  int64_t n_times = 0;
  int64_t n_conditions = 0;
  std::vector<float> observations;  // (L, S, T)
  std::vector<float> treatments;    // (L, C)
  std::vector<int32_t> devices;     // (L,)
  std::vector<float> times;         // (T,)
  std::string error;
};

}  // namespace

extern "C" {

// Parse one plate-reader CSV. List arguments are ';'-joined strings.
// Returns an opaque handle (nullptr only on allocation failure); check
// slode_proc_error for parse errors.
void* slode_proc_parse(const char* path, const char* devices_join,
                       const char* conditions_join, const char* signals_join) {
  auto* d = new ProcData();
  std::vector<std::string> device_names = split(devices_join, ';');
  std::vector<std::string> conditions = split(conditions_join, ';');
  std::vector<std::string> signals = split(signals_join, ';');
  d->n_signals = static_cast<int64_t>(signals.size());
  d->n_conditions = static_cast<int64_t>(conditions.size());

  std::unordered_map<std::string, int32_t> device_map;
  for (size_t i = 0; i < device_names.size(); ++i)
    device_map[device_names[i]] = static_cast<int32_t>(i);

  std::ifstream f(path);
  if (!f) {
    d->error = std::string("cannot open ") + path;
    return d;
  }
  std::string line;
  if (!std::getline(f, line)) {
    d->error = "empty file";
    return d;
  }
  std::vector<std::string> header = split(line, ',');
  const size_t data_col0 = 5;
  // per-column signal index (into `signals`), or -1
  std::vector<int> col_signal(header.size(), -1);
  std::vector<std::vector<size_t>> signal_cols(signals.size());
  std::vector<size_t> od_cols;
  for (size_t c = data_col0; c < header.size(); ++c) {
    std::string h = header[c].substr(0, header[c].find('.'));
    std::string sig = extract_signal(h);
    if (sig == "OD") od_cols.push_back(c);
    for (size_t s = 0; s < signals.size(); ++s) {
      if (sig == signals[s]) {
        col_signal[c] = static_cast<int>(s);
        signal_cols[s].push_back(c);
      }
    }
  }
  // time row
  if (!std::getline(f, line)) {
    d->error = "missing time row";
    return d;
  }
  std::vector<std::string> time_fields = split(line, ',');
  for (size_t c : od_cols)
    d->times.push_back(c < time_fields.size() ? std::strtof(time_fields[c].c_str(), nullptr) : 0.f);
  d->n_times = static_cast<int64_t>(d->times.size());
  for (size_t s = 0; s < signals.size(); ++s) {
    if (static_cast<int64_t>(signal_cols[s].size()) != d->n_times) {
      d->error = "signal " + signals[s] + " has mismatched column count";
      return d;
    }
  }

  // data rows
  while (std::getline(f, line)) {
    std::vector<std::string> fields = split(line, ',');
    if (fields.size() < data_col0) continue;
    auto it = device_map.find(strip(fields[0]));
    if (it == device_map.end()) continue;

    // conditions: "C6=25000;C12=5" -> per-condition float, extras must be 0
    std::vector<float> treat(conditions.size(), 0.f);
    bool extras_zero = true;
    std::string cond = strip(fields[4]);
    if (cond.find('=') != std::string::npos) {
      for (const std::string& part : split(cond, ';')) {
        size_t eq = part.find('=');
        if (eq == std::string::npos) continue;
        std::string key = strip(part.substr(0, eq));
        float val = std::strtof(part.c_str() + eq + 1, nullptr);
        bool known = false;
        for (size_t k = 0; k < conditions.size(); ++k) {
          if (key == conditions[k]) {
            treat[k] = val;
            known = true;
          }
        }
        if (!known && val != 0.f) extras_zero = false;
      }
    }
    if (!extras_zero) continue;

    d->devices.push_back(it->second);
    d->treatments.insert(d->treatments.end(), treat.begin(), treat.end());
    for (size_t s = 0; s < signals.size(); ++s) {
      for (size_t c : signal_cols[s]) {
        d->observations.push_back(
            c < fields.size() ? std::strtof(fields[c].c_str(), nullptr) : 0.f);
      }
    }
    ++d->n_rows;
  }
  return d;
}

int64_t slode_proc_rows(void* h) { return static_cast<ProcData*>(h)->n_rows; }
int64_t slode_proc_times_len(void* h) { return static_cast<ProcData*>(h)->n_times; }
const char* slode_proc_error(void* h) {
  ProcData* d = static_cast<ProcData*>(h);
  return d->error.empty() ? nullptr : d->error.c_str();
}

void slode_proc_fill(void* h, float* obs, float* treatments, int32_t* devices,
                     float* times) {
  ProcData* d = static_cast<ProcData*>(h);
  std::memcpy(obs, d->observations.data(), d->observations.size() * sizeof(float));
  std::memcpy(treatments, d->treatments.data(), d->treatments.size() * sizeof(float));
  std::memcpy(devices, d->devices.data(), d->devices.size() * sizeof(int32_t));
  std::memcpy(times, d->times.data(), d->times.size() * sizeof(float));
}

void slode_proc_free(void* h) { delete static_cast<ProcData*>(h); }

// Gather rows of `src` (n_rows x row_elems floats) by `perm` (padded_rows
// entries; entries < 0 gather row 0 with zero mask semantics handled by the
// caller) into `dst` (padded_rows x row_elems).
void slode_pack_epoch(const float* src, int64_t n_rows, int64_t row_elems,
                      const int32_t* perm, int64_t padded_rows, float* dst) {
  for (int64_t i = 0; i < padded_rows; ++i) {
    int32_t j = perm[i];
    if (j < 0 || j >= n_rows) {
      std::memset(dst + i * row_elems, 0, row_elems * sizeof(float));
    } else {
      std::memcpy(dst + i * row_elems, src + j * row_elems,
                  row_elems * sizeof(float));
    }
  }
}

}  // extern "C"
