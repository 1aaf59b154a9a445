-- SF-PINNED snapshot oracle (20 rows at the driver gate
-- SF, sf0.01): a committed regression pin of a deterministic but
-- non-SQL-expressible output. Regenerate ONLY after a deliberate
-- semantic change: scripts/gen_sf_snapshot.py <verifyOut> d_simhash64
WITH t(doc_a, doc_b, hamming) AS (VALUES
(8, 245, 3),
(31, 383, 5),
(45, 267, 1),
(45, 413, 0),
(58, 293, 4),
(61, 185, 2),
(70, 447, 2),
(72, 377, 3),
(87, 134, 0),
(92, 450, 2),
(98, 290, 4),
(107, 387, 3),
(120, 332, 6),
(152, 178, 4),
(166, 323, 4),
(267, 413, 1),
(295, 374, 3),
(326, 457, 4),
(393, 420, 3),
(435, 486, 6))
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b, CAST(hamming AS INTEGER) AS hamming FROM t ORDER BY ALL