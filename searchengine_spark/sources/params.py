"""Parameter-file source (reference: QryEval.readParameterFile,
QryEval.java:241-276): ``key=value`` lines -> engine run config.

Mirrors the reference's keys (indexPath, queryFilePath,
trecEvalOutputPath, retrievalAlgorithm, BM25:k_1/b/k_3, Indri:mu/lambda,
fb*, diversity:*) and its validation of the three required keys.
"""

from __future__ import annotations

from dataclasses import dataclass, field


def read_param_file(path: str) -> dict[str, str]:
    params: dict[str, str] = {}
    with open(path) as fh:
        for line in fh:
            line = line.strip()
            if not line or line.startswith("#") or "=" not in line:
                continue
            k, _, v = line.partition("=")
            params[k.strip()] = v.strip()
    required = ("indexPath", "queryFilePath", "trecEvalOutputPath")
    missing = [k for k in required if k not in params]
    if missing:
        raise ValueError(f"Required parameter(s) missing: {', '.join(missing)}")
    return params


@dataclass
class RunConfig:
    index_path: str
    query_file: str
    output_path: str
    algorithm: str = "bm25"
    model_params: dict = field(default_factory=dict)
    output_length: int = 100
    fb: dict | None = None
    diversity: dict | None = None
    # evalQrelsFile + evalMetricsPath opt into engine-side scoring of
    # the run (eval.ir_metrics) — the reference shells out to trec_eval
    # for this step, so these keys are an extension, not QryEval parity
    eval: dict | None = None

    @classmethod
    def from_params(cls, p: dict[str, str]) -> "RunConfig":
        algo = p.get("retrievalAlgorithm", "bm25").lower()
        mp: dict = {}
        if algo == "bm25":
            for src, dst in (("BM25:k_1", "k1"), ("BM25:b", "b"), ("BM25:k_3", "k3")):
                if src in p:
                    mp[dst] = float(p[src])
        elif algo == "indri":
            for src, dst in (("Indri:mu", "mu"), ("Indri:lambda", "lam")):
                if src in p:
                    mp[dst] = float(p[src])
        fb = None
        if p.get("fb", "false").lower() not in ("false", ""):
            fb = {
                "fb": p["fb"].lower(),
                "fb_docs": int(p.get("fbDocs", 10)),
                "fb_terms": int(p.get("fbTerms", 10)),
                "fb_mu": float(p.get("fbMu", 0)),
                "fb_orig_weight": float(p.get("fbOrigWeight", 0.5)),
                "expansion_file": p.get("fbExpansionQueryFile"),
                "initial_ranking_file": p.get("fbInitialRankingFile"),
            }
        dv = None
        if p.get("diversity", "false").lower() == "true":
            dv = {
                "algorithm": p.get("diversity:algorithm", "xquad").lower(),
                "lambda": float(p.get("diversity:lambda", 0.5)),
                "max_input": int(p.get("diversity:maxInputRankingsLength", 100)),
                "max_result": int(p.get("diversity:maxResultRankingLength", 100)),
                "intents_file": p.get("diversity:intentsFile"),
                "initial_ranking_file": p.get("diversity:initialRankingFile"),
            }
        ev = None
        if p.get("evalQrelsFile") and p.get("evalMetricsPath"):
            ev = {
                "qrels_file": p["evalQrelsFile"],
                "metrics_path": p["evalMetricsPath"],
                "k": int(p.get("evalK", 10)),
            }
        return cls(
            index_path=p["indexPath"],
            query_file=p["queryFilePath"],
            output_path=p["trecEvalOutputPath"],
            algorithm=algo,
            model_params=mp,
            output_length=int(p.get("trecEvalOutputLength", 100)),
            fb=fb,
            diversity=dv,
            eval=ev,
        )
