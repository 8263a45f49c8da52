"""Registry entries, round 7: grouped retrieval evaluation (per-query
nDCG over a query relation — the operational generalization of q219's
single-query anchor), the PQ asymmetric-distance serving probe with
FROZEN codebooks (the q217/q221 deployed-artifact discipline applied to
product quantization, closing q104's serving half), and five
curation-pipeline gates: shingle CONTAINMENT (asymmetric near-dup),
the vocabulary coverage curve, DSIR-shaped importance selection,
a k-anonymity census, per-dimension embedding QA, the exact
tie-corrected ROC-AUC of the deployed quality model, and
cluster-balanced subsampling with the deployed quantizer.

House discipline throughout: integer-derived grades, transcendentals
frozen to 6 dp literals offline, DECIMAL-summed accumulations with one
final double division, every output column BIGINT/DOUBLE/VARCHAR so no
DuckDB HUGEINT/TIMESTAMPTZ reaches the driver comparator.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .catalog import load_table
from .functions.vectors import (
    indexable_vector,
    l2_norm,
    sql_cosine,
    sql_indexable,
    sql_l2_norm,
)
from .operators.retrieval import (
    grouped_bm25_ndcg,
    sql_grouped_bm25_ndcg,
)
from .registry import query

# ---------------------------------------------------------------------------
# Grouped retrieval eval: per-query nDCG@10 of BM25 (q222).
# ---------------------------------------------------------------------------
#: The frozen eval-query relation: four two-term probes over the corpus
#: vocabulary. ("spark", "vector") is q219's anchor query, kept so the
#: grouped metric is directly comparable to the single-query gate.
_Q222_QUERIES = (
    ("spark", "vector"),
    ("hash", "merge"),
    ("stream", "window"),
    ("customer", "query"),
)
_Q222_K = 10


@query(
    "q222_grouped_ndcg",
    sql_grouped_bm25_ndcg(_Q222_QUERIES, k=_Q222_K),
)
def q222(spark, sf_dir):
    """Per-query nDCG@10 over a query RELATION — what a retrieval team
    actually monitors (one metric row per eval query), generalizing
    q219's single-query gate.  All ranking windows are partitioned BY
    query_id and their ``row_number() <= k`` filters compile to
    WindowGroupLimit (partial top-k before the shuffle — pinned in
    tests/test_plans.py), so no unpartitioned window and no full
    per-query sort exists anywhere in the retrieval family.

    fan_out (r11b): the single tokenize pass that builds the operator's
    checkpointed tf frame is per-row CPU-heavy and the local table
    scans as ONE row-group — the guarded repartition spreads it across
    the cluster exactly like the dedup family's shingle builds (no-op
    at production scale where the scan is already parallel)."""
    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    return grouped_bm25_ndcg(docs, _Q222_QUERIES, k=_Q222_K)


# ---------------------------------------------------------------------------
# PQ asymmetric-distance probe with the frozen codebook (q223) —
# closes q104's serving half as an oracled gate.
# ---------------------------------------------------------------------------
#: Deployed PQ codebook artifact: ``similarity.pq_train`` on the
#: sf0.01 embedding pool (m=8 subspaces x k=16 centroids x
#: sub_dim=8, seed 42), every component frozen to 6 dp.  With the
#: codebook as literals, both the ENCODE argmin and the ADC probe
#: are pure mul/add/sqrt algebra - bit-identical across engines.
_Q223_BOOKS = (
    (
        (-0.04984, 0.018558, 0.073122, -0.052407, -0.201494, 0.066155, -0.037087, 0.012789),
        (0.025528, 0.12874, -0.104211, -0.093385, 0.000383, 0.051367, -0.015586, 0.156516),
        (-0.0138, -0.103218, -0.099677, 0.030692, -0.111634, -0.093353, 0.121762, -0.010504),
        (-0.092024, -0.012886, -0.107051, -0.060154, 0.102319, 0.117761, 0.155045, -0.052829),
        (0.151454, -0.023255, 0.076406, -0.073936, -0.054254, -0.052652, 0.011777, -0.04865),
        (0.044377, -0.058369, -0.051984, 0.01557, 0.09414, -0.164031, -0.080415, 0.099278),
        (0.094315, -0.107541, 0.027516, 0.069669, 0.037035, 0.124041, -0.154173, 0.017217),
        (-0.063773, 0.044409, 0.144032, -0.040816, 0.026001, -0.134049, 0.078613, 0.139411),
        (-0.045817, -0.027096, 0.063054, -0.043542, 0.125369, -0.043018, -0.13337, -0.0991),
        (0.059835, 0.060347, -0.14114, -0.00798, -0.120534, 0.047334, -0.078426, -0.046677),
        (-0.137695, -0.083948, -0.044819, -0.027184, 0.01965, 0.046249, -0.113896, 0.062335),
        (-0.039763, -0.022118, 0.056366, 0.158728, -0.033053, 0.012765, 0.062586, 0.060017),
        (-0.023216, 0.197566, 0.070946, 0.027503, 0.013544, 0.096645, -0.075763, -0.063979),
        (0.065405, 0.003438, -0.116575, 0.135497, 0.065109, 0.073251, 0.03809, -0.149544),
        (-0.12116, -8.2e-05, 0.099526, -0.088895, 0.044254, -0.05251, 0.075572, -0.095389),
        (0.178267, 0.010684, 0.03634, -0.009041, 0.103899, 0.019294, 0.030519, 0.143968),
    ),
    (
        (0.179204, 0.021573, -0.129851, 0.084293, -0.095682, 0.050494, 0.019406, -0.026513),
        (-0.038067, -0.156906, 0.025255, 0.082178, 0.086531, 0.090471, -0.003261, -0.001443),
        (-0.108141, 0.105416, -0.029801, -0.057785, 0.037824, 0.192967, 0.018646, 0.085389),
        (0.085093, -0.015817, -0.073341, 0.044856, 0.039527, -0.142959, 0.153336, 0.000515),
        (-0.031602, 0.064208, 0.016208, 0.179764, -0.086058, -0.025136, -0.157393, 0.038104),
        (-0.00457, -0.034653, -0.105649, 0.014367, 0.031683, 0.026306, -0.052316, 0.18661),
        (-0.095809, -0.166728, -0.112833, -0.04331, -0.02516, 0.059439, 0.054398, -0.1578),
        (0.088275, 0.01707, 0.079452, -0.054007, 0.074428, 0.09368, 0.137527, 0.078174),
        (0.060663, -0.092011, 0.205447, 0.15665, -0.011936, -0.006846, -0.024051, 0.037731),
        (-0.076865, 0.146992, -0.062744, 0.044649, 0.119191, -0.042047, 0.017127, -0.048593),
        (0.033906, 0.182471, 0.11708, 0.021217, -0.098053, 0.051019, 0.022226, -0.062809),
        (-0.059747, -0.064547, -0.015342, -0.086172, -0.094846, 0.019501, -0.152603, -0.114879),
        (-0.111884, -0.042896, 0.066787, -0.019903, -0.143723, 0.019021, 0.117623, -0.010474),
        (-0.052346, 0.033739, 0.133028, -0.006687, 0.055814, -0.18538, -0.033734, 0.047392),
        (0.05584, -0.025014, 0.087419, -0.174396, 0.018141, -0.024493, -0.11145, 0.09092),
        (0.028575, -0.067489, 0.028536, -0.087694, -0.02396, -0.124253, 0.002542, -0.114129),
    ),
    (
        (-0.046121, 0.197855, -0.01736, 0.013218, -0.069242, 0.089569, 0.082384, -0.099682),
        (0.063281, -0.088005, 0.047057, 0.069485, 0.035186, -0.081084, 0.119183, -0.062347),
        (-0.025391, -0.148452, -0.015273, 0.010046, 0.014401, -0.090971, -0.081698, 0.077032),
        (0.072453, 0.086416, 0.06953, -0.086411, -0.084063, 0.030446, 0.026775, 0.17446),
        (-0.060839, 0.057198, -0.132943, -0.060452, 0.0694, 0.01158, -0.086207, 0.014866),
        (0.162932, 0.047494, 0.034387, -0.073075, -0.055785, 0.040755, 0.035457, -0.179245),
        (0.019425, 0.063215, -0.071003, 0.087072, -0.116537, -0.06643, -0.059674, -0.066068),
        (0.198044, -0.028793, -0.02842, 0.127857, 0.016449, 0.03343, -0.081987, 0.081479),
        (-0.147781, -0.054388, -0.075233, 0.087146, -0.100856, -0.08156, 0.097996, 0.10324),
        (-0.019568, -0.140996, -0.111511, -0.083183, -0.044377, 0.021312, -0.01053, -0.103025),
        (-0.053808, 0.046398, 0.029396, -0.146191, 0.11815, 0.023688, 0.126108, -0.212248),
        (-0.062006, 0.104628, 0.136489, -0.066486, -0.058169, -0.141961, -0.002679, -0.036419),
        (-0.003304, -0.040496, 0.135755, 0.028786, 0.077168, 0.001008, -0.152822, -0.014571),
        (-0.104148, -0.036331, 0.110604, -0.019129, -0.058089, 0.169862, -0.0108, 0.06476),
        (-0.022621, 0.092055, 0.025262, 0.088725, 0.099826, 0.040773, 0.040963, 0.004463),
        (0.078461, -0.080478, -0.133394, -0.004447, 0.054867, 0.069243, 0.096489, 0.109369),
    ),
    (
        (0.004842, -0.031402, -0.003423, 0.092956, 0.136953, -0.049488, -0.008872, 0.045842),
        (-0.151779, 0.063823, 0.122418, 0.069296, -0.04078, 0.166154, -0.037342, 0.01245),
        (0.103042, 0.015937, -0.041447, 0.047856, 0.017962, 0.158744, 0.083707, -0.103569),
        (0.088313, 0.197661, 0.095845, -0.036993, 0.012758, -0.04196, -0.001149, 0.116837),
        (0.108, 0.096711, -0.028148, 0.145203, -0.093791, 0.016527, -0.046357, 0.063143),
        (0.041879, -0.145268, 0.021782, 0.058449, -0.073551, -0.108317, 0.071398, -0.108292),
        (-0.022499, 0.140983, -0.041729, 0.003493, -0.061032, -0.121092, 0.122847, -0.071729),
        (-0.154003, -0.018924, -0.053005, -0.118409, 0.124154, -0.017921, -0.034454, -0.128791),
        (0.018878, -0.080996, 0.115305, 0.034159, -0.028597, -0.083029, -0.026659, 0.189687),
        (-0.025086, 0.0026, -0.090099, 0.16527, -0.013263, -0.029131, -0.073628, -0.147908),
        (-0.07417, 0.095891, -0.141149, -0.031143, 0.02432, 0.060493, -0.03944, 0.08428),
        (-0.058461, 0.007824, 0.058033, -0.099154, -0.044691, -0.131494, -0.098166, 0.01733),
        (0.09631, -0.114959, -0.093438, 0.000728, -0.055838, 0.051668, 0.098166, 0.099452),
        (0.080648, 0.01801, 0.184516, -0.045476, 0.051396, 0.090851, -0.032508, -0.108619),
        (-0.054405, -0.084576, -0.001194, -0.063842, 0.072668, 0.013288, 0.149719, -0.021131),
        (-0.025438, -0.058256, -0.065542, -0.022063, -0.122667, 0.052511, -0.170305, -0.012093),
    ),
    (
        (-0.007441, -0.043497, 0.054395, 0.053253, -0.199475, -0.056132, 0.124009, 0.022564),
        (0.007393, 0.044001, 0.037843, 0.037243, -0.040908, -2.7e-05, -0.089939, -0.21495),
        (0.172989, -0.087383, 0.037318, -0.030405, 0.064086, 0.082257, -0.007385, 0.033419),
        (-0.014451, -0.07849, -0.0598, -0.132315, 0.044917, -0.139364, -0.066178, 0.110439),
        (0.130754, 0.146258, -0.092931, 0.026765, 0.020647, -0.003031, 0.087903, 0.033121),
        (-0.041734, -0.058422, -0.044299, 0.134295, 0.151547, 0.048071, 0.030161, -0.009193),
        (0.037242, 0.071038, -0.079117, -0.016386, -0.094633, 0.14597, -0.074102, 0.008562),
        (-0.021601, -0.172888, -0.108084, -0.000336, -0.021898, -0.007626, -0.087243, -0.053193),
        (-0.087196, -0.082453, 0.169195, 0.012058, 0.053668, -0.033421, -0.00586, 0.006079),
        (-0.023948, -0.028416, 0.015522, 0.069016, -0.026513, 0.076284, 0.033336, 0.219033),
        (0.089886, 0.128012, 0.036729, 0.005089, 0.076531, -0.089769, -0.185433, 0.008436),
        (-0.071934, 0.022207, -0.016729, -0.071004, 0.032872, 0.09768, 0.118251, -0.075312),
        (0.08324, -0.055615, 0.040961, -0.185658, -0.053616, -0.087616, 0.072042, -0.058496),
        (0.001745, 0.041871, -0.037558, 0.144038, -0.002946, -0.162094, 0.02337, -0.074724),
        (-0.165619, 0.006797, 0.009448, -0.128547, -0.096016, 0.07969, -0.104014, -0.067417),
        (0.054881, 0.141557, 0.172487, 0.033629, -0.015417, 0.029697, 0.069172, -0.005706),
    ),
    (
        (-0.061893, 0.077928, 0.131, -0.028626, -0.023992, -0.18889, -0.079019, -0.040493),
        (0.155055, -0.143784, 0.022612, -0.077846, 0.021977, -0.0251, 0.01821, -0.024305),
        (-0.019216, -0.119575, -0.04001, 0.064744, 0.108383, 0.116925, 0.017603, 0.023801),
        (-0.123408, 0.032439, -0.072911, -0.003892, -0.054127, 0.056294, -0.040244, -0.113888),
        (0.088354, 0.146414, -0.098889, -0.096136, -0.065524, -0.008121, 0.023771, 0.057886),
        (0.015387, -0.016386, -0.069354, -0.046882, -0.064102, 0.039116, -0.165661, 0.035961),
        (0.106644, -0.028679, 0.041734, 0.163654, -0.110446, 0.081104, -0.047333, 0.044574),
        (0.053339, 0.042116, -0.02775, 0.134055, 0.06138, -0.114919, -0.017463, 0.068183),
        (0.060992, -0.031638, 0.206136, -0.096383, 0.089503, 0.029517, 0.068898, -0.002665),
        (-0.053881, -0.079369, -0.084389, -0.000737, -0.032871, -0.141258, 0.075549, -0.101572),
        (-0.075637, 0.200384, -8.1e-05, -0.005562, 0.109716, 0.039767, 0.058869, 0.087973),
        (0.061615, 0.091599, 0.049057, 0.044888, -0.093703, 0.079759, 0.111956, -0.159452),
        (-0.015971, -0.048702, 0.21454, 0.008308, -0.11076, 0.074506, -0.093513, -0.120035),
        (-0.037815, -0.011648, -0.086684, -0.175439, 0.070768, -0.071684, -0.069538, 0.062784),
        (-0.173722, -0.070441, 0.07859, 0.078208, -0.02817, -0.011419, 0.033136, 0.092334),
        (-0.007919, -0.074384, -0.060518, -0.010729, -0.10764, 0.023364, 0.083695, 0.14107),
    ),
    (
        (-0.052757, -0.100057, -0.007114, -0.03898, 0.140603, -0.010986, -0.097346, 0.022224),
        (-0.103927, 0.084404, -0.024753, 0.164254, -0.151945, 0.031912, 0.092737, -0.086754),
        (-0.204582, -0.076055, -0.015302, 0.087801, -0.046041, -0.00394, -0.017011, 0.104179),
        (-0.035766, -0.011875, 0.090525, 0.035276, -0.047405, 0.080993, -0.114702, -0.182744),
        (-0.129948, 0.057105, -0.03097, 0.031701, 0.133095, -0.069085, 0.055481, 0.022403),
        (-0.051048, 0.054316, 0.103088, 0.010272, 0.071534, 0.14766, 0.057004, 0.001745),
        (0.053777, 0.051486, -0.102946, -0.121131, -0.021693, 0.031099, 0.115249, -0.051017),
        (-0.017789, -0.103702, -0.15679, -0.113576, 0.001269, 0.023513, -0.060873, -0.051596),
        (0.061994, 0.127671, 0.083733, -0.018429, 0.056028, -0.07652, -0.060218, -0.059345),
        (0.163371, -0.213633, 0.066562, 0.009887, -0.045927, 0.015003, -0.045471, 0.055513),
        (0.046629, -0.025029, -0.072383, 0.084323, -0.023984, 0.088239, 0.023296, 0.105552),
        (0.092401, 0.056161, -0.083805, 0.12008, -0.038402, -0.180977, -0.101817, 0.067725),
        (-0.012013, -0.139451, 0.022575, 0.092014, 0.027825, -0.123549, 0.064412, -0.098816),
        (-0.061807, -0.041858, 0.03079, -0.074153, -0.175938, -0.00375, 0.058069, 0.037626),
        (0.071554, 0.016812, 0.10968, -0.011278, 0.115896, -0.065825, 0.121076, 0.112328),
        (0.098442, 0.028636, 0.109529, -0.154013, -0.04627, -0.004577, -0.115536, -0.045647),
    ),
    (
        (-0.067671, 0.078903, 0.14403, -0.059891, -0.108497, 0.042251, -0.065768, 0.089077),
        (0.160561, 0.102431, 0.013246, 0.015806, 0.157031, -0.026954, -0.066567, 0.035749),
        (-0.01535, -0.101114, 0.061867, -0.102484, 0.131075, 0.055529, -0.056727, -0.006569),
        (0.112316, -0.068605, 0.052443, 0.121479, -0.062189, -0.099172, -0.027589, -0.051343),
        (0.098721, -0.093875, -0.027852, -0.020955, 0.011555, 0.10028, 0.126828, 0.084478),
        (-0.042998, -0.146386, -0.054223, -0.116337, -0.073082, -0.007167, 0.048172, -0.001092),
        (-0.063814, 0.030895, 0.067517, -0.026462, 0.012702, -0.08168, 0.161708, -0.06206),
        (-0.030278, -0.035384, 0.19182, 0.033771, -0.085115, 0.013253, -0.033738, -0.171072),
        (0.04654, 0.120013, -0.007104, -0.1428, -0.057551, 0.059177, -0.013642, -0.076547),
        (0.06405, 0.01035, 0.145636, 0.094264, 0.061787, 0.173014, 0.001475, -0.025337),
        (-0.021152, 0.039633, -0.077379, 0.175568, -0.032559, -0.026414, 0.117115, 0.011478),
        (0.041142, -0.005945, -0.195216, -0.072425, 0.075952, -0.130549, 0.016157, -0.053784),
        (-0.095699, -0.030712, -0.064911, 0.038202, 0.037713, 0.024151, -0.0949, -0.137949),
        (-0.062988, 0.05015, -0.01615, -0.064645, -0.073125, -0.1825, -0.06386, 0.0982),
        (-0.106769, 0.081493, -0.075009, 0.021443, 0.092211, 0.003348, -0.049998, 0.176541),
        (0.004448, -0.018867, -0.097776, 0.044613, -0.103185, 0.136011, -0.0519, -0.017657),
    ),
)

#: ||centroid||^2 per (subspace, code) — computed ONCE here from the
#: frozen 6 dp codebook and embedded as the SAME Python float literal
#: in both expression trees, so the encode argmin
#: ``argmin_c (||c||^2 - 2<x_j, c>)`` (the monotone form of the
#: subspace L2 distance for a fixed x_j) never re-derives it.
_Q223_C2 = tuple(
    tuple(sum(v * v for v in cent) for cent in book)
    for book in _Q223_BOOKS
)
_Q223_M = 8
_Q223_SUB = 8
_Q223_NC = 16
_Q223_K = 10
_Q223_REFINE = 5


def _q223_oracle() -> str:
    nrm = sql_l2_norm("embedding")

    def dotsub(vec: str, j: int, cent) -> str:
        # <vec[8j+1 .. 8j+8], cent> with the SAME left-to-right term
        # order the Spark zip_with fold uses
        off = j * _Q223_SUB
        terms = " + ".join(
            f"{vec}[{off + i + 1}] * {cent[i]!r}"
            for i in range(_Q223_SUB)
        )
        return f"({terms})"

    code_cols = []
    for j in range(_Q223_M):
        scores = ", ".join(
            f"round({_Q223_C2[j][c]!r} - 2.0 * "
            f"{dotsub('xn', j, _Q223_BOOKS[j][c])}, 6)"
            for c in range(_Q223_NC)
        )
        code_cols.append(
            f"CAST(list_position([{scores}],"
            f" list_aggregate([{scores}], 'min')) AS INT) AS code{j}"
        )
    codes_sql = ",\n             ".join(code_cols)
    lut_cols = ", ".join(
        "["
        + ", ".join(
            f"round({dotsub('qn', j, _Q223_BOOKS[j][c])}, 6)"
            for c in range(_Q223_NC)
        )
        + f"] AS lut{j}"
        for j in range(_Q223_M)
    )
    adc = " + ".join(f"lut{j}[code{j}]" for j in range(_Q223_M))
    cos = sql_cosine("p.embedding", "q.qv")
    return f"""WITH pool AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id <> 0 AND {sql_indexable('embedding')}),
    pn AS (
      SELECT vec_id,
             list_transform(embedding, x -> x::DOUBLE / {nrm}) AS xn
      FROM pool),
    q AS (
      SELECT embedding AS qv,
             list_transform(embedding,
                 x -> x::DOUBLE / {nrm}) AS qn
      FROM embeddings WHERE vec_id = 0),
    codes AS (
      SELECT vec_id,
             {codes_sql}
      FROM pn),
    lut AS (SELECT {lut_cols} FROM q),
    scored AS (
      SELECT vec_id, round({adc}, 6) AS adc
      FROM codes, lut),
    coarse AS (
      SELECT vec_id, adc FROM scored
      ORDER BY adc DESC, vec_id LIMIT {_Q223_K * _Q223_REFINE})
    SELECT p.vec_id, c.adc, round({cos}, 6) AS cosine
    FROM coarse c
    JOIN pool p USING (vec_id), q
    ORDER BY cosine DESC, p.vec_id LIMIT {_Q223_K}"""


@query("q223_pq_adc_probe_portable", _q223_oracle())
def q223(spark, sf_dir):
    """The PQ serving loop with the DEPLOYED codebook artifact,
    hash-checked end to end (the q217/q221 discipline applied to
    product quantization — q104's k-means TRAINING stays rows-only by
    nature; its probe half is now an oracled gate):

    1. ENCODE: every indexable vector L2-normalizes and takes, per
       subspace j, ``argmin_c round(||C_jc||^2 - 2<x_j, C_jc>, 6)``
       (the monotone form of the subspace L2 distance — ||x_j||^2 is
       constant within a row), first-index tiebreak.  Pure literal
       algebra in one codegen'd scan — the map pass a 100 TB ingest
       runs to write the m*4-bit code column.
    2. ADC PROBE: the query row builds its 8x16 inner-product LUT once
       on a ONE-ROW frame (broadcast — never recomputed per scanned
       row); each row's approximate cosine is 8 array picks summed
       within the row; top k*refine by ADC, vec_id tiebreak.
    3. EXACT REFINE: only the <=50 survivors rejoin their full-width
       vectors (broadcast semi-side) for the exact-cosine top-k.

    At 100 TB the ranking scan carries only (vec_id, 8 codes) — m*4
    bits of payload per row in the real layout; the wide embedding
    column moves for <=k*refine rows.  Every arithmetic step is a
    fixed-order IEEE tree shared with the DuckDB twin (reference probe
    semantics: Jegou et al., PQ ANN; cf. operators/similarity.py
    pq_topk for the parameterized operator this gate freezes)."""
    emb = load_table(spark, sf_dir, "embeddings")
    # fan_out on the POOL side only (r11b, guide §2.6/§4): the encode
    # projection (8 subspaces × 16 centroids of literal dot-product
    # folds per row) is the per-row-CPU-heaviest scan in the IVF/PQ
    # family, and the local table is one row-group — the whole encode
    # serialized on one core (profiled: a single 1.8 s task under a
    # 3.4 s query).  The guarded repartition spreads it; the one-row
    # query side stays on the plain scan (no shuffle to extract one
    # row).  A/B at sf0.1: 2.44 → 1.97 s wall, rows identical.
    pool = load_table(spark, sf_dir, "embeddings", fan_out=True).where(
        (F.col("vec_id") != 0) & indexable_vector(F.col("embedding"))
    )

    # EVALUATE-ONCE LAYOUT (A/B'd at sf0.1): the naive single
    # projection inlined each 16-entry score array TWICE (once under
    # array_position, once under array_min) and each sub-slice 16
    # times — ~9.5 s/query interpreted; a HOF rewrite walking the
    # codebook as one nested literal was worse still (~65 s: per-
    # element lambda interpretation).  Hoisting the sub-slices and the
    # per-subspace score ARRAYS into named projection columns lets
    # codegen compute each exactly once — 0.25 s for the same encode
    # arithmetic (same fixed-order trees, same rounding; the oracle
    # hash is unchanged).
    pn = (
        pool.select(
            "vec_id",
            F.col("embedding").cast("array<double>").alias("_e"),
            l2_norm(F.col("embedding")).alias("_nrm"),
        )
        .select(
            "vec_id",
            F.transform(
                F.col("_e"), lambda x: x / F.col("_nrm")
            ).alias("xn"),
        )
        .select(
            "vec_id",
            *[
                F.slice("xn", j * _Q223_SUB + 1, _Q223_SUB).alias(
                    f"sub{j}"
                )
                for j in range(_Q223_M)
            ],
        )
    )

    # The per-centroid score trees are built as SQL STRINGS parsed
    # JVM-side in one call per projection: composing the same trees
    # through the Python Column DSL costs thousands of py4j round
    # trips — ~7.7 s of pure DataFrame CONSTRUCTION per query build
    # (measured; analysis 0.45 s, execution ~2 s).  The parsed
    # expressions are the identical Catalyst nodes (same HOF folds,
    # same D-suffixed double literals), so values and the oracle hash
    # are unchanged.
    #
    # Task-binary size: these m×n_centroids×sub_dim double literals
    # (8×256×4 here) serialize INTO the task closure, which is what
    # trips Spark's "Broadcasting large task binary with size ~1 MiB"
    # notice in bench runs.  That is the deployed-artifact trade by
    # design — the frozen codebook ships with the plan exactly like a
    # broadcast dim table, ~1 MiB once per stage, independent of data
    # volume — so the notice is expected and benign at any scale.
    def sql_dotsub(col: str, cent) -> str:
        arr = "array(" + ", ".join(f"{v!r}D" for v in cent) + ")"
        return (
            f"aggregate(zip_with({col}, {arr}, (x, y) -> x * y), "
            f"0.0D, (acc, x) -> acc + x)"
        )

    scs = pn.selectExpr(
        "vec_id",
        *[
            "array("
            + ", ".join(
                f"round({_Q223_C2[j][c]!r}D - 2.0D * "
                f"{sql_dotsub(f'sub{j}', _Q223_BOOKS[j][c])}, 6)"
                for c in range(_Q223_NC)
            )
            + f") AS sc{j}"
            for j in range(_Q223_M)
        ],
    )
    codes = scs.selectExpr(
        "vec_id",
        *[
            f"CAST(array_position(sc{j}, array_min(sc{j})) AS INT)"
            f" AS code{j}"
            for j in range(_Q223_M)
        ],
    )

    qrow = (
        emb.where(F.col("vec_id") == 0)
        .select(
            F.col("embedding").alias("qv"),
            F.col("embedding").cast("array<double>").alias("_e"),
            l2_norm(F.col("embedding")).alias("_nrm"),
        )
        .select(
            "qv",
            F.transform(
                F.col("_e"), lambda x: x / F.col("_nrm")
            ).alias("qn"),
        )
        .select(
            "qv",
            *[
                F.slice("qn", j * _Q223_SUB + 1, _Q223_SUB).alias(
                    f"qsub{j}"
                )
                for j in range(_Q223_M)
            ],
        )
    )
    lut = qrow.selectExpr(
        *[
            "array("
            + ", ".join(
                f"round({sql_dotsub(f'qsub{j}', _Q223_BOOKS[j][c])}, 6)"
                for c in range(_Q223_NC)
            )
            + f") AS lut{j}"
            for j in range(_Q223_M)
        ]
    )
    adc = " + ".join(
        f"element_at(lut{j}, code{j})" for j in range(_Q223_M)
    )
    coarse = (
        codes.crossJoin(F.broadcast(lut))
        .selectExpr("vec_id", f"round({adc}, 6) AS adc")
        .orderBy(F.col("adc").desc(), "vec_id")
        .limit(_Q223_K * _Q223_REFINE)
    )

    from .pipeline_queries10 import _cos_total

    return (
        pool.join(F.broadcast(coarse), "vec_id")
        .crossJoin(F.broadcast(qrow.select("qv")))
        .select(
            "vec_id",
            "adc",
            F.round(
                _cos_total(F.col("embedding"), F.col("qv")), 6
            ).alias("cosine"),
        )
        .orderBy(F.col("cosine").desc(), "vec_id")
        .limit(_Q223_K)
    )


# ---------------------------------------------------------------------------
# Asymmetric near-dup: shingle CONTAINMENT (q224).
# ---------------------------------------------------------------------------
_Q224_TAU = 0.8
#: stop-shingle document-frequency cap (hard_negative_pairs' bound,
#: exposed per VERDICT r7 #6): shingles appearing in more than this
#: many documents leave the posting join, bounding the hot-key fanout
#: at cap² rows per shingle instead of quadratic-in-the-Zipf-head.
#: The cap only ever SHRINKS `common` (the denominator n_sub stays the
#: full shingle count), so a capped run under-reports containment —
#: conservative for dedup (may miss), never a false positive.  At
#: τ=0.8 and DF≤1000 nothing drops on the test corpora; mining runs on
#: boilerplate-heavy corpora tighten it (the q150 observable-cap
#: pattern; fanout bound pinned in tests/test_pipeline_ops.py).
_Q224_DF_CAP = 1000


def _q224_oracle() -> str:
    from .functions.text import sql_tokens

    t = sql_tokens("text")
    return f"""WITH toks AS (
      SELECT doc_id, {t} AS t FROM documents),
    sh AS (
      SELECT doc_id,
             list_distinct(list_transform(range(1, len(t)-1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS shingles
      FROM toks WHERE len(t) >= 3),
    ex0 AS (SELECT doc_id, unnest(shingles) AS s FROM sh),
    kept AS (SELECT s FROM ex0 GROUP BY s
             HAVING count(*) <= {_Q224_DF_CAP}),
    ex AS (SELECT doc_id, ex0.s FROM ex0 JOIN kept ON ex0.s = kept.s),
    pairs AS (
      SELECT a.doc_id AS id_sub, b.doc_id AS id_super,
             count(*) AS common
      FROM ex a JOIN ex b ON a.s = b.s AND a.doc_id <> b.doc_id
      GROUP BY 1, 2)
    SELECT id_sub, id_super,
           CAST(sa.n AS BIGINT) AS n_sub,
           round(common::DOUBLE / sa.n, 6) AS containment
    FROM pairs
    JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sa
      ON sa.doc_id = id_sub
    JOIN (SELECT doc_id, len(shingles) AS n FROM sh) sb
      ON sb.doc_id = id_super
    WHERE (sa.n < sb.n OR (sa.n = sb.n AND id_sub < id_super))
      AND common::DOUBLE / sa.n >= {_Q224_TAU}"""


@query("q224_shingle_containment", _q224_oracle())
def q224(spark, sf_dir):
    """ASYMMETRIC near-dup detection: shingle containment
    C(A→B) = |sh(A) ∩ sh(B)| / |sh(A)| — the quote/subset relation
    symmetric Jaccard (q32) structurally misses: a 100-word passage
    embedded verbatim in a 10,000-word page has Jaccard ≈ 0.01 but
    containment 1.0.  Broder's two resemblance measures; training-data
    curation needs BOTH (containment finds boilerplate wrappers and
    quoted-article pages).

    Same scale shape as the Jaccard family: the shared persisted
    shingle posting table → stop-shingle DF cap (r8: exposed and
    threaded exactly like hard_negative_pairs' — see _Q224_DF_CAP) →
    posting-list equi-join (never doc×doc) → per-pair common counts →
    size join → integer-ratio threshold.  Direction is
    smaller-into-larger (id tiebreak on equal sizes), so each relation
    reports once."""
    from .pipeline_queries import (
        hot_shingles_prebuilt,
        shingle_prebuilt_table,
    )

    sh = shingle_prebuilt_table(spark, sf_dir)
    return shingle_containment_pairs(
        sh, hot_df=hot_shingles_prebuilt(spark, sf_dir, _Q224_DF_CAP)
    )


def shingle_containment_pairs(
    sh,
    tau: float = _Q224_TAU,
    shingle_df_cap: int = _Q224_DF_CAP,
    hot_df=None,
):
    """q224's pair computation over a prebuilt shingle table, with the
    stop-shingle DF cap as a real parameter (tests pin the fanout
    bound by driving it low on a boilerplate-heavy corpus).  Pass the
    persisted ``hot_shingles_prebuilt`` table as ``hot_df`` to skip
    the in-query DF count (the registered q224 does)."""
    ex = sh.select(
        "doc_id", F.explode("shingles").alias("s")
    )
    # the cap is enforced as a broadcast ANTI-join against the HOT set
    # (DF > cap) rather than an equi-join against the kept set: kept is
    # posting-table-sized (a full shuffle join — the first cut cost
    # 2.7 s vs the uncapped 1.5 s at sf0.1), while Zipf guarantees the
    # over-cap head is a handful of shingles at any sane cap — the
    # anti-join is map-side, and with the prebuilt artifact even the
    # DF count moves to ingest time (the ANALYZE-statistic pattern)
    hot = (
        hot_df
        if hot_df is not None
        else ex.groupBy("s")
        .agg(F.count("*").alias("_df_s"))
        .filter(F.col("_df_s") > shingle_df_cap)
        .select("s")
    )
    ex = ex.join(F.broadcast(hot), on="s", how="left_anti")
    a = ex.select(F.col("doc_id").alias("id_sub"), "s")
    b = ex.select(F.col("doc_id").alias("id_super"), "s")
    pairs = (
        a.join(b, "s")
        .where(F.col("id_sub") != F.col("id_super"))
        .groupBy("id_sub", "id_super")
        .agg(F.count("*").alias("common"))
    )
    sizes = sh.select(
        "doc_id", F.size("shingles").alias("n")
    )
    return (
        pairs.join(
            sizes.select(
                F.col("doc_id").alias("id_sub"), F.col("n").alias("n_sub0")
            ),
            "id_sub",
        )
        .join(
            sizes.select(
                F.col("doc_id").alias("id_super"),
                F.col("n").alias("n_super0"),
            ),
            "id_super",
        )
        .where(
            (F.col("n_sub0") < F.col("n_super0"))
            | (
                (F.col("n_sub0") == F.col("n_super0"))
                & (F.col("id_sub") < F.col("id_super"))
            )
        )
        .where(
            F.col("common").cast("double") / F.col("n_sub0")
            >= F.lit(tau)
        )
        .select(
            "id_sub",
            "id_super",
            F.col("n_sub0").cast("long").alias("n_sub"),
            F.round(
                F.col("common").cast("double") / F.col("n_sub0"), 6
            ).alias("containment"),
        )
    )


# ---------------------------------------------------------------------------
# Vocabulary coverage curve (q225).
# ---------------------------------------------------------------------------
_Q225_TOPN = 20


def _q225_oracle() -> str:
    from .functions.text import sql_tokens

    t = sql_tokens("text")
    return f"""WITH tok AS (
      SELECT unnest({t}) AS w FROM documents),
    vc AS (SELECT w, CAST(count(*) AS BIGINT) AS cnt
           FROM tok GROUP BY w),
    tot AS (SELECT CAST(sum(cnt) AS BIGINT) AS n FROM vc),
    top AS (
      SELECT w, cnt FROM vc
      ORDER BY cnt DESC, w LIMIT {_Q225_TOPN}),
    ranked AS (
      SELECT w, cnt,
             CAST(row_number() OVER (ORDER BY cnt DESC, w) AS BIGINT)
               AS rank,
             CAST(sum(cnt) OVER (ORDER BY cnt DESC, w
                 ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_cnt
      FROM top)
    SELECT rank, w AS token, cnt, cum_cnt,
           round(CAST(cum_cnt AS DOUBLE) / tot.n, 6) AS cum_share
    FROM ranked, tot"""


@query("q225_vocab_coverage", _q225_oracle())
def q225(spark, sf_dir):
    """The tokenizer-design number: what share of the corpus's token
    MASS the top-k vocabulary entries cover (Zipf head coverage).  A
    vocab-size decision (and an OOV-rate estimate) reads directly off
    this curve; it also feeds the stop-shingle/stopword cap choices
    the dedup family uses.

    Scale shape: one explode → partial-aggregated vocab count table →
    TakeOrdered top-N (never a full vocab sort — the curve's head is
    the deliverable) → rank/cumsum windows over the N-row frame
    (constant partition key: single tiny partition by construction) →
    one broadcast total-mass row."""
    from pyspark.sql import Window

    from .functions.text import tokens

    docs = load_table(spark, sf_dir, "documents")
    vc = (
        docs.select(F.explode(tokens("text")).alias("w"))
        .groupBy("w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    tot = vc.agg(F.sum("cnt").cast("long").alias("n"))
    top = vc.orderBy(F.col("cnt").desc(), "w").limit(_Q225_TOPN)
    w_rank = Window.partitionBy(F.lit(0)).orderBy(
        F.col("cnt").desc(), "w"
    )
    w_cum = w_rank.rowsBetween(Window.unboundedPreceding, 0)
    return (
        top.withColumn(
            "rank", F.row_number().over(w_rank).cast("long")
        )
        .withColumn("cum_cnt", F.sum("cnt").over(w_cum).cast("long"))
        .crossJoin(F.broadcast(tot))
        .select(
            "rank",
            F.col("w").alias("token"),
            "cnt",
            "cum_cnt",
            F.round(
                F.col("cum_cnt").cast("double") / F.col("n"), 6
            ).alias("cum_share"),
        )
    )


# ---------------------------------------------------------------------------
# DSIR-shaped importance selection (q226).
# ---------------------------------------------------------------------------
_Q226_TARGET = "src3"
_Q226_TOPM = 50


def _q226_oracle() -> str:
    from .functions.text import sql_tokens

    t = sql_tokens("text")
    return f"""WITH tok AS (
      SELECT doc_id, source, unnest({t}) AS w FROM documents),
    corp_c AS (SELECT w, count(*) AS c FROM tok GROUP BY w),
    targ_c AS (SELECT w, count(*) AS ct FROM tok
               WHERE source = '{_Q226_TARGET}' GROUP BY w),
    v AS (SELECT count(*) AS vsz FROM corp_c),
    tot AS (SELECT CAST(count(*) AS BIGINT) AS n FROM tok),
    targ_n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM tok
               WHERE source = '{_Q226_TARGET}'),
    scored AS (
      SELECT t.doc_id,
             CAST(count(*) AS BIGINT) AS n_tokens,
             sum(CAST(round(ln((coalesce(targ_c.ct, 0) + 1.0)
                               / (targ_n.nt + v.vsz)), 6)
                      AS DECIMAL(18,6))
                 - CAST(round(ln((corp_c.c + 1.0) / (tot.n + v.vsz)), 6)
                        AS DECIMAL(18,6))) AS s
      FROM tok t
      JOIN corp_c USING (w)
      LEFT JOIN targ_c USING (w)
      CROSS JOIN v CROSS JOIN tot CROSS JOIN targ_n
      WHERE t.source <> '{_Q226_TARGET}'
      GROUP BY t.doc_id)
    SELECT doc_id, n_tokens,
           CAST((CAST(s * 1000000 AS BIGINT) + n_tokens * 1000000000)
                // n_tokens - 1000000000 AS DOUBLE) / 1000000.0
             AS log_ratio
    FROM scored
    ORDER BY (CAST(s * 1000000 AS BIGINT) + n_tokens * 1000000000)
             // n_tokens DESC, doc_id
    LIMIT {_Q226_TOPM}"""


@query("q226_dsir_importance", _q226_oracle())
def q226(spark, sf_dir):
    """Data Selection with Importance Resampling (DSIR-shaped): score
    every OUT-of-target document by the per-token log-likelihood ratio
    between the TARGET source's unigram LM and the corpus LM, and keep
    the top-m — "find me more data that looks like src3".  This is
    q214's distribution machinery pointed at per-DOCUMENT selection
    instead of per-source monitoring, the standard recipe for growing
    a domain slice from a general crawl.

    Portability: both LMs use add-one smoothing over the corpus vocab;
    each token's two lns are 6 dp-rounded and their difference
    DECIMAL-summed per document (order-independent), one final double
    division by the doc's token count.  Scale: linear posting joins
    (token → corpus count, token → target count), three broadcast
    1-row stats, TakeOrdered top-m — never a vocab x doc expansion.

    ONE fanned-out tokenize pass (r11b, guide §2.3): the token stream
    feeds five consumers (corpus counts, target counts, vocab, total,
    the scored join) and each re-ran the tokenize scan; the
    checkpointed token-ARRAY table (text-scale, far below the exploded
    token stream) is tokenized once and re-exploded per consumer —
    explode over materialized arrays is cheap, re-tokenizing is not."""
    from .functions.text import tokens

    docs = load_table(spark, sf_dir, "documents", fan_out=True)
    toks = docs.select(
        "doc_id", "source", tokens("text").alias("_l")
    ).localCheckpoint(eager=False)
    tok = toks.select(
        "doc_id", "source", F.explode("_l").alias("w")
    )
    corp_c = tok.groupBy("w").agg(F.count("*").alias("c"))
    targ = tok.where(F.col("source") == _Q226_TARGET)
    targ_c = targ.groupBy("w").agg(F.count("*").alias("ct"))
    v = corp_c.agg(F.count("*").alias("vsz"))
    tot = tok.agg(F.count("*").cast("bigint").alias("n"))
    targ_n = targ.agg(F.count("*").cast("bigint").alias("nt"))
    ln_t = F.round(
        F.log(
            (F.coalesce(F.col("ct"), F.lit(0)) + F.lit(1.0))
            / (F.col("nt") + F.col("vsz"))
        ),
        6,
    ).cast("decimal(18,6)")
    ln_c = F.round(
        F.log(
            (F.col("c") + F.lit(1.0)) / (F.col("n") + F.col("vsz"))
        ),
        6,
    ).cast("decimal(18,6)")
    scored = (
        tok.where(F.col("source") != _Q226_TARGET)
        .join(corp_c, "w")
        .join(targ_c, "w", "left")
        .crossJoin(F.broadcast(v))
        .crossJoin(F.broadcast(tot))
        .crossJoin(F.broadcast(targ_n))
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_tokens"),
            F.sum(ln_t - ln_c).alias("s"),
        )
    )
    # per-doc ratio floored at 1e-6 via INTEGER division on the exact
    # micro-sum (r9 fuzz seed 23 caught a half-micro round() seam:
    # Spark BigDecimal HALF_UP vs DuckDB float rounding — the q235
    # class); the +n*1e9 offset keeps the numerator positive so
    # truncating (Spark DIV) and flooring (DuckDB //) division agree
    # on negative log-ratios, then shifts back
    ratio_micro = F.expr(
        "(CAST(s * 1000000 AS BIGINT) + n_tokens * 1000000000)"
        " DIV n_tokens - 1000000000"
    )
    return (
        scored.select(
            "doc_id",
            "n_tokens",
            (ratio_micro.cast("double") / F.lit(1000000.0)).alias(
                "log_ratio"
            ),
        )
        .orderBy(F.col("log_ratio").desc(), "doc_id")
        .limit(_Q226_TOPM)
    )


# ---------------------------------------------------------------------------
# k-anonymity census over quasi-identifiers (q227).
# ---------------------------------------------------------------------------
_Q227_KS = (2, 5, 10, 25)


def _q227_oracle() -> str:
    ks = ", ".join(f"({k})" for k in _Q227_KS)
    return f"""WITH classes AS (
      SELECT lang, source, CAST(floor(n_chars / 100) AS BIGINT) AS len_bucket,
             CAST(count(*) AS BIGINT) AS class_size
      FROM documents GROUP BY 1, 2, 3),
    ks(k) AS (VALUES {ks})
    SELECT CAST(k AS BIGINT) AS k,
           CAST(count(CASE WHEN class_size < k THEN 1 END) AS BIGINT)
             AS n_classes_below,
           CAST(coalesce(sum(CASE WHEN class_size < k
                                  THEN class_size END), 0) AS BIGINT)
             AS n_docs_below
    FROM classes CROSS JOIN ks GROUP BY k"""


@query("q227_k_anonymity_census", _q227_oracle())
def q227(spark, sf_dir):
    """Privacy-readiness audit: how many quasi-identifier equivalence
    classes (lang × source × length-bucket) fall below each
    k-anonymity threshold, and how many documents they strand —
    the census you read before releasing per-slice statistics or
    deciding which cells need suppression/generalization (Sweeney's
    k-anonymity, applied as a data-release gate).

    One groupBy over the quasi-identifier tuple (partial-aggregated),
    then a constant 4-row threshold frame crossed against the
    class-size table — the census never touches row-level data again.
    All integer arithmetic."""
    docs = load_table(spark, sf_dir, "documents")
    classes = docs.groupBy(
        "lang",
        "source",
        F.floor(F.col("n_chars") / 100).cast("long").alias("len_bucket"),
    ).agg(F.count("*").cast("long").alias("class_size"))
    ks = F.array(*[F.lit(k) for k in _Q227_KS])
    return (
        classes.select(
            "class_size", F.explode(ks).alias("k0")
        )
        .select("class_size", F.col("k0").cast("long").alias("k"))
        .groupBy("k")
        .agg(
            F.count(
                F.when(F.col("class_size") < F.col("k"), 1)
            ).alias("n_classes_below"),
            F.coalesce(
                F.sum(
                    F.when(
                        F.col("class_size") < F.col("k"),
                        F.col("class_size"),
                    )
                ),
                F.lit(0),
            )
            .cast("long")
            .alias("n_docs_below"),
        )
    )


# ---------------------------------------------------------------------------
# Embedding-column QA: per-dimension statistics (q228).
# ---------------------------------------------------------------------------
def _q228_oracle() -> str:
    return """WITH ex AS (
      SELECT unnest(range(1, len(embedding) + 1)) AS dim,
             unnest(embedding) AS x
      FROM embeddings WHERE embedding IS NOT NULL),
    st AS (
      SELECT CAST(dim AS BIGINT) AS dim,
             CAST(count(x) AS BIGINT) AS n,
             sum(CAST(round(x::DOUBLE, 6) AS DECIMAL(18,6))) AS s,
             sum(CAST(round(x::DOUBLE, 6) AS DECIMAL(18,6))
                 * CAST(round(x::DOUBLE, 6) AS DECIMAL(18,6))) AS s2,
             min(x::DOUBLE) AS lo, max(x::DOUBLE) AS hi
      FROM ex GROUP BY dim)
    SELECT dim, n,
           round(CAST(s AS DOUBLE) / n, 6) AS mean,
           round(CAST(s2 AS DOUBLE) / n
                 - (CAST(s AS DOUBLE) / n) * (CAST(s AS DOUBLE) / n), 6)
             AS variance,
           round(lo, 6) AS min_x, round(hi, 6) AS max_x
    FROM st"""


@query("q228_embedding_dim_qa", _q228_oracle())
def q228(spark, sf_dir):
    """Embedding-column QA before any indexing run: per-DIMENSION
    count/mean/variance/min/max over the whole table — the gate that
    catches dead dimensions (variance 0 — a projection bug), clipped
    dimensions (min==max at a saturation bound), and scale drift
    between embedding-model versions, none of which the per-VECTOR
    norm filter (indexable_vector) can see.

    Portability: per-dimension sums are DECIMAL over 6 dp-rounded
    components (order-independent across partitions; the decimal
    product for the square is exact), two final double divisions per
    dimension.  Scale: one posexplode → 64-key partial-aggregated
    groupBy; output is dim-count rows however large the table."""
    emb = load_table(spark, sf_dir, "embeddings").where(
        F.col("embedding").isNotNull()
    )
    ex = emb.select(
        F.posexplode(F.col("embedding").cast("array<double>")).alias(
            "pos", "x"
        )
    ).select((F.col("pos") + 1).cast("long").alias("dim"), "x")
    x6 = F.round(F.col("x"), 6).cast("decimal(18,6)")
    st = ex.groupBy("dim").agg(
        F.count("x").cast("long").alias("n"),
        F.sum(x6).alias("s"),
        F.sum(x6 * x6).alias("s2"),
        F.min("x").alias("lo"),
        F.max("x").alias("hi"),
    )
    mean = F.col("s").cast("double") / F.col("n")
    return st.select(
        "dim",
        "n",
        F.round(mean, 6).alias("mean"),
        F.round(
            F.col("s2").cast("double") / F.col("n") - mean * mean, 6
        ).alias("variance"),
        F.round("lo", 6).alias("min_x"),
        F.round("hi", 6).alias("max_x"),
    )


# ---------------------------------------------------------------------------
# Exact tie-corrected ROC-AUC of the deployed quality model (q229).
# ---------------------------------------------------------------------------
def _q229_oracle() -> str:
    from .pipeline_queries3 import _SQL_QUALITY
    from .pipeline_queries5 import _Q121_FEATS_CTE, _QCLF

    return f"""WITH feats AS ({_Q121_FEATS_CTE}),
    scored AS (
      SELECT doc_id,
             CAST(floor(1000000.0 / (1.0 + exp(-{_QCLF}))) AS BIGINT)
                 AS p_micro
      FROM feats),
    lab AS (
      SELECT doc_id,
             CASE WHEN {_SQL_QUALITY} >= 0.5 THEN 1 ELSE 0 END AS label
      FROM documents),
    per_s AS (
      SELECT s.p_micro,
             CAST(count(CASE WHEN l.label = 1 THEN 1 END) AS BIGINT)
                 AS pos_s,
             CAST(count(CASE WHEN l.label = 0 THEN 1 END) AS BIGINT)
                 AS neg_s
      FROM scored s JOIN lab l USING (doc_id)
      WHERE s.p_micro IS NOT NULL
      GROUP BY s.p_micro),
    ranked AS (
      SELECT pos_s, neg_s,
             CAST(coalesce(sum(neg_s) OVER (ORDER BY p_micro
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                 AS BIGINT) AS cum_neg_below
      FROM per_s),
    agg AS (
      SELECT CAST(sum(pos_s) AS BIGINT) AS n_pos,
             CAST(sum(neg_s) AS BIGINT) AS n_neg,
             CAST(count(*) AS BIGINT) AS n_scores,
             CAST(sum(pos_s * (2 * cum_neg_below + neg_s)) AS BIGINT)
                 AS u2
      FROM ranked)
    SELECT n_pos, n_neg, n_scores,
           CASE WHEN n_pos > 0 AND n_neg > 0
                THEN round(CAST(u2 AS DOUBLE)
                           / (2.0 * n_pos * n_neg), 6) END AS auc
    FROM agg"""


@query("q229_classifier_auc", _q229_oracle())
def q229(spark, sf_dir):
    """Threshold-free ranking quality of the deployed quality model:
    EXACT tie-corrected ROC-AUC against the weak label, via the
    Mann–Whitney rank-sum identity — the eval q210's calibration table
    (threshold buckets) cannot express. INTEGER-exact throughout: with
    per-score positive/negative counts, ``2·U = Σ_s pos_s·(2·cum_neg_<s
    + neg_s)`` is a sum of integers (the ½-tie credit absorbed by the
    doubling), and AUC is ONE final double division.

    Scale shape: one scan scores + labels, one groupBy on the
    micro-floored score — whose cardinality is bounded at 1,000,001 by
    CONSTRUCTION, so the cumulative window runs over a bounded frame
    at any data scale (the scalewin aggregate-table argument; at
    petabyte row counts the integer products route through
    DECIMAL(38,0) before the division — here BIGINT holds them with
    room to spare)."""
    from pyspark.sql import Window

    from .operators.text_analysis import (
        with_gopher_quality,
        with_quality_score,
    )

    docs = load_table(spark, sf_dir, "documents")
    from .pipeline_queries5 import qclf_z

    # both operators are withColumn-style over the same scan — compose
    # them into ONE projection instead of a scored⋈label self-join
    # (r8: halves the document scans; identical expressions, same rows)
    both = with_quality_score(with_gopher_quality(docs))
    z = qclf_z()
    scored = both.select(
        F.floor(F.lit(1000000.0) / (F.lit(1.0) + F.exp(-z)))
        .cast("long")
        .alias("p_micro"),
        (F.col("quality_score") >= 0.5).cast("int").alias("label"),
    )
    per_s = (
        scored
        # NULL-text rows score NULL; the eval ranks SCORED docs only —
        # and NULL keys sort NULLS FIRST in Spark vs NULLS LAST in
        # DuckDB, so leaving them in flips the cumulative sum
        .where(F.col("p_micro").isNotNull())
        .groupBy("p_micro")
        .agg(
            F.count(F.when(F.col("label") == 1, 1))
            .cast("long")
            .alias("pos_s"),
            F.count(F.when(F.col("label") == 0, 1))
            .cast("long")
            .alias("neg_s"),
        )
    )
    w = Window.orderBy("p_micro").rowsBetween(
        Window.unboundedPreceding, -1
    )
    ranked = per_s.select(
        "pos_s",
        "neg_s",
        F.coalesce(F.sum("neg_s").over(w), F.lit(0))
        .cast("long")
        .alias("cum_neg_below"),
    )
    agg = ranked.agg(
        F.sum("pos_s").cast("long").alias("n_pos"),
        F.sum("neg_s").cast("long").alias("n_neg"),
        F.count("*").cast("long").alias("n_scores"),
        F.sum(
            F.col("pos_s")
            * (F.lit(2) * F.col("cum_neg_below") + F.col("neg_s"))
        )
        .cast("long")
        .alias("u2"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        "n_scores",
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0),
            F.round(
                F.col("u2").cast("double")
                / (F.lit(2.0) * F.col("n_pos") * F.col("n_neg")),
                6,
            ),
        ).alias("auc"),
    )


# ---------------------------------------------------------------------------
# Cluster-balanced subsampling with the deployed quantizer (q230).
# ---------------------------------------------------------------------------
_Q230_QUOTA = 20


def _q230_oracle() -> str:
    from .pipeline_queries10 import _Q217_CENTROIDS
    from .functions.vectors import sql_cosine, sql_indexable

    def sql_cent(c) -> str:
        return "([" + ", ".join(repr(v) for v in c) + "]::DOUBLE[])"

    score_cols = ",\n             ".join(
        f"round({sql_cosine('embedding', sql_cent(c))}, 6) AS s{i}"
        for i, c in enumerate(_Q217_CENTROIDS)
    )
    arr = "[" + ", ".join(
        f"s{i}" for i in range(len(_Q217_CENTROIDS))
    ) + "]"
    return f"""WITH pool AS (
      SELECT vec_id, embedding FROM embeddings
      WHERE vec_id <> 0 AND {sql_indexable('embedding')}),
    scored AS (
      SELECT vec_id,
             {score_cols}
      FROM pool),
    assigned AS (
      SELECT vec_id,
             CAST(list_position({arr},
                 list_aggregate({arr}, 'max')) - 1 AS INT) AS list_id
      FROM scored),
    ranked AS (
      SELECT vec_id, list_id,
             CAST(row_number() OVER (
                 PARTITION BY list_id
                 ORDER BY ('0x' || substr(md5(CAST(vec_id AS VARCHAR)),
                                          1, 15))::BIGINT,
                          vec_id) AS BIGINT) AS smp_rank
      FROM assigned)
    SELECT vec_id, list_id, smp_rank
    FROM ranked WHERE smp_rank <= {_Q230_QUOTA}"""


@query("q230_cluster_balanced_sample", _q230_oracle())
def q230(spark, sf_dir):
    """Topic-BALANCED subsampling (the SemDeDup/DoReMi-adjacent corpus
    recipe): every vector lands in its deployed-quantizer cluster
    (q217's frozen centroid artifact — the assignment pass a 100 TB
    ingest has already run), and each cluster contributes at most a
    fixed quota of rows chosen by a DETERMINISTIC hash order (md5 of
    the id, the engine-portable rank the sampling family uses) — so an
    over-represented topic cannot flood the sample the way q97's
    metadata quota can't see.

    Scale shape: one codegen'd scan computes the 8 frozen-centroid
    scores; one shuffle on list_id; the quota filter compiles to
    partial+final WindowGroupLimit (each map task forwards at most
    QUOTA rows per cluster — pinned in tests/test_plans.py).  The
    hash order makes the sample reproducible row-for-row across runs,
    partitionings, and engines — no RNG anywhere."""
    from pyspark.sql import Window

    from .operators.dedup import md5_60
    from .pipeline_queries10 import _Q217_CENTROIDS
    from .functions.vectors import indexable_vector, lit_cosine_scores

    emb = load_table(spark, sf_dir, "embeddings").where(
        (F.col("vec_id") != 0) & indexable_vector(F.col("embedding"))
    )
    # literal-codebook scores as one JVM-parsed SQL string (q217
    # discipline) — identical trees, ~1.2 s less construction per pass
    scores = lit_cosine_scores("embedding", _Q217_CENTROIDS, round_dp=6)
    assigned = emb.select(
        "vec_id",
        scores.alias("sc"),
    ).select(
        "vec_id",
        (F.array_position("sc", F.array_max("sc")) - 1)
        .cast("int")
        .alias("list_id"),
    )
    w = Window.partitionBy("list_id").orderBy(
        md5_60(F.col("vec_id").cast("string")), "vec_id"
    )
    return (
        assigned.withColumn(
            "smp_rank", F.row_number().over(w).cast("long")
        )
        .where(F.col("smp_rank") <= _Q230_QUOTA)
        .select("vec_id", "list_id", "smp_rank")
    )


# ---------------------------------------------------------------------------
# Per-source token fingerprint: grouped top-k by share (q231).
# ---------------------------------------------------------------------------
_Q231_K = 5


def _q231_oracle() -> str:
    from .functions.text import sql_tokens

    t = sql_tokens("text")
    return f"""WITH tok AS (
      SELECT source, unnest({t}) AS w FROM documents
      WHERE source IS NOT NULL),
    vc AS (SELECT source, w, CAST(count(*) AS BIGINT) AS cnt
           FROM tok GROUP BY source, w),
    tot AS (SELECT source, CAST(sum(cnt) AS BIGINT) AS n
            FROM vc GROUP BY source),
    ranked AS (
      SELECT source, w, cnt,
             CAST(row_number() OVER (PARTITION BY source
                 ORDER BY cnt DESC, w) AS BIGINT) AS rank
      FROM vc)
    SELECT r.source, r.rank, r.w AS token, r.cnt,
           round(CAST(r.cnt AS DOUBLE) / t.n, 6) AS share
    FROM ranked r JOIN tot t USING (source)
    WHERE r.rank <= {_Q231_K}"""


@query("q231_source_token_fingerprint", _q231_oracle())
def q231(spark, sf_dir):
    """Per-SOURCE vocabulary fingerprint: each source's top-k tokens by
    count with their share of that source's token mass — the grouped
    twin of q225's global coverage head, and the table you scan to
    spot a source whose head vocabulary doesn't look like prose
    (boilerplate dumps, machine noise) before q214's KL number tells
    you something is off.

    Scale shape: one explode → partial-aggregated (source, token)
    count table → the rank's ``row_number() <= k`` filter compiles to
    partial+final WindowGroupLimit on source (each map task forwards
    at most k rows per source) → per-source totals join (source-count
    sized, broadcast at any realistic source cardinality).  Integer
    counts, one final double division."""
    from pyspark.sql import Window

    from .functions.text import tokens

    docs = load_table(spark, sf_dir, "documents").where(
        F.col("source").isNotNull()
    )
    vc = (
        docs.select("source", F.explode(tokens("text")).alias("w"))
        .groupBy("source", "w")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    tot = vc.groupBy("source").agg(F.sum("cnt").cast("long").alias("n"))
    w = Window.partitionBy("source").orderBy(F.col("cnt").desc(), "w")
    return (
        vc.withColumn("rank", F.row_number().over(w).cast("long"))
        .where(F.col("rank") <= _Q231_K)
        .join(tot, "source")
        .select(
            "source",
            "rank",
            F.col("w").alias("token"),
            "cnt",
            F.round(F.col("cnt").cast("double") / F.col("n"), 6).alias(
                "share"
            ),
        )
    )
