// Reference-parity sequence generator.
//
// Replicates the reference CLI's random input mode BYTE-FOR-BYTE
// (reference src/main.cpp:109-120 random_string, :90-107
// uniform_ACGT_distribution, :200-211 the `align -r [min max]` path):
// a default-constructed std::mt19937_64 (seed 5489), query drawn first,
// then subject, each with length ~ uniform_int_distribution<size_t>
// {minlen, maxlen} and symbols ~ uniform_int_distribution<char>{0,3}
// mapped to ACGT.
//
// Distribution semantics are implementation-defined; this must be built
// with libstdc++ (g++ on Linux), the toolchain the reference's AnyDSL
// build uses, so that `align -r min max` on a real reference binary
// consumes the exact same byte streams recorded in tests/golden/.
//
// Usage: refgen <minlen> <maxlen> [npairs]
// Emits 2*npairs FASTA records to stdout, alternating query/subject
// (the RNG advances across pairs, pair k = the state after 2k draws).
#include <cstdio>
#include <cstdlib>
#include <random>
#include <string>

class uniform_ACGT_distribution {
public:
    uniform_ACGT_distribution() : rndNum_{0, 3} {}
    template <class URNG>
    char operator()(URNG& urng) {
        switch (rndNum_(urng)) {
            case 0: return 'A';
            case 1: return 'C';
            case 2: return 'G';
            case 3: return 'T';
            default: return '_';
        }
    }
private:
    std::uniform_int_distribution<char> rndNum_;
};

template <class URNG>
std::string random_string(std::size_t minlen, std::size_t maxlen,
                          URNG& urng) {
    std::string s;
    s.resize(
        std::uniform_int_distribution<std::size_t>{minlen, maxlen}(urng));
    uniform_ACGT_distribution chars;
    for (auto& c : s) c = chars(urng);
    return s;
}

int main(int argc, char* argv[]) {
    if (argc < 3) {
        std::fprintf(stderr, "usage: refgen <minlen> <maxlen> [npairs]\n");
        return 1;
    }
    std::size_t minlen = std::strtoull(argv[1], nullptr, 10);
    std::size_t maxlen = std::strtoull(argv[2], nullptr, 10);
    int npairs = argc > 3 ? std::atoi(argv[3]) : 1;
    if (maxlen < minlen) std::swap(minlen, maxlen);
    std::mt19937_64 urng;  // default seed, as main.cpp:207
    for (int k = 0; k < npairs; ++k) {
        std::string q = random_string(minlen, maxlen, urng);
        std::string s = random_string(minlen, maxlen, urng);
        std::printf(">query_%d len=%zu\n%s\n", k, q.size(), q.c_str());
        std::printf(">subject_%d len=%zu\n%s\n", k, s.size(), s.c_str());
    }
    return 0;
}
