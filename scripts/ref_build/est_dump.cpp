/* Diagnostic tool (NOT part of any benchmark): dump the reference's
 * per-candidate ESTIMATE-stage logliks for aligned reads, to triage
 * estimate-ordering divergence between this framework and the
 * reference binary (round-5 reference-binary parity work).
 *
 * Input: a DB prefix and an hmmufotu-format assignment TSV (for the
 * id + alignment columns).  For each row, rebuilds the DigitalSeq
 * from the alignment string, runs getSeed + estimateSeq exactly like
 * hmmufotu.cpp:640-656, and prints one line per candidate:
 *   read_id<TAB>node_id<TAB>pdist<TAB>est_loglik<TAB>wnr<TAB>ratio
 *
 * Usage: est_dump <DB> <TSV> [maxNSeed]
 */
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

#include "HmmUFOtu.h"
#include "HmmUFOtu_main.h"

using namespace std;
using namespace EGriceLab;
using namespace EGriceLab::HmmUFOtu;

int main(int argc, char* argv[]) {
	if (argc < 3) {
		cerr << "Usage: " << argv[0] << " <DB> <TSV> [maxNSeed]" << endl;
		return 1;
	}
	string db = argv[1], tsvFn = argv[2];
	int maxNSeed = argc > 3 ? atoi(argv[3]) : 50;
	double maxDiff = EGriceLab::HmmUFOtu::inf;
	double maxHeight = EGriceLab::HmmUFOtu::inf;

	ifstream msaIn((db + ".msa").c_str(), ios::binary);
	if (loadProgInfo(msaIn).bad()) return 1;
	MSA msa;
	msa.load(msaIn);
	ifstream ptuIn((db + ".ptu").c_str(), ios::binary);
	if (loadProgInfo(ptuIn).bad()) return 1;
	PTUnrooted ptu;
	ptu.load(ptuIn);
	const DegenAlphabet* abc = AlphabetFactory::nuclAbc;

	ifstream tsv(tsvFn.c_str());
	string line;
	while (getline(tsv, line)) {
		if (line.empty() || line[0] == '#') continue;
		vector<string> f;
		istringstream iss(line);
		string tok;
		while (getline(iss, tok, '\t')) f.push_back(tok);
		if (f.size() < 10 || f[0] == "id") continue;
		const string& id = f[0];
		const string& alnStr = f[9];
		int csStart = atoi(f[6].c_str());
		int csEnd = atoi(f[7].c_str());
		if (csStart <= 0 || csEnd <= 0) continue;
		DigitalSeq seq(abc, id, alnStr);
		int start = csStart - 1, end = csEnd - 1;
		vector<PTUnrooted::PTLoc> seeds =
			getSeed(ptu, seq, start, end, maxDiff, maxHeight);
		if (seeds.size() > (size_t) maxNSeed)
			seeds.erase(seeds.end() - (seeds.size() - maxNSeed),
			            seeds.end());
		vector<PTUnrooted::PTPlacement> places =
			estimateSeq(ptu, seq, seeds, "unweighted");
		for (size_t i = 0; i < places.size(); ++i) {
			const PTUnrooted::PTPlacement& p = places[i];
			printf("%s\t%ld\t%.10g\t%.10g\t%.10g\t%.10g\n",
			       id.c_str(), p.cNode->getId(), seeds[i].dist,
			       p.loglik, p.wnr, p.ratio);
		}
	}
	return 0;
}
