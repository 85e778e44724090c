// Sample analyzer plugin exercising the irs plugin C ABI
// (iresearch_tpu/utils/plugins.py). Built by tests/test_plugins.py:
//   g++ -shared -fPIC -O2 -o libanalyzer-shout.so native/sample_plugin.cpp
//
// Registers one analyzer, "shout": whitespace tokenization with ASCII
// uppercasing. The ABI mirrors the role of the reference's plugin
// shared objects (core/utils/register.hpp:78-117), with an explicit
// manifest + tokenize entry point instead of C++ static initializers.

#include <cctype>
#include <cstring>

extern "C" {

const char* irs_plugin_manifest() {
  return "{\"abi\": 1, \"analyzers\": [\"shout\"]}";
}

// Writes '\n'-separated uppercased tokens to out. Returns bytes written,
// -(needed) when cap is too small, or -1 for an unknown analyzer.
long irs_plugin_tokenize(const char* analyzer, const char* text,
                         long text_len, char* out, long cap) {
  if (std::strcmp(analyzer, "shout") != 0) return -1;
  long need = text_len + 1;
  if (need > cap) return -need;
  long n = 0;
  bool in_tok = false;
  for (long i = 0; i < text_len; ++i) {
    unsigned char c = static_cast<unsigned char>(text[i]);
    if (std::isspace(c)) {
      if (in_tok) {
        out[n++] = '\n';
        in_tok = false;
      }
    } else {
      out[n++] = static_cast<char>(std::toupper(c));
      in_tok = true;
    }
  }
  // trim a trailing separator
  if (n > 0 && out[n - 1] == '\n') --n;
  return n;
}

}  // extern "C"
