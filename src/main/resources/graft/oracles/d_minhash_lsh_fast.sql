-- SF-PINNED snapshot oracle (25 rows at the driver gate
-- SF, sf0.01): a committed regression pin of a deterministic but
-- non-SQL-expressible output. Regenerate ONLY after a deliberate
-- semantic change: scripts/gen_sf_snapshot.py <verifyOut> d_minhash_lsh_fast
WITH t(doc_a, doc_b, jaccard) AS (VALUES
(8, 245, CAST('0.9878' AS DOUBLE)),
(26, 455, CAST('0.9' AS DOUBLE)),
(31, 383, CAST('0.9762' AS DOUBLE)),
(44, 446, CAST('0.9565' AS DOUBLE)),
(45, 267, CAST('0.974' AS DOUBLE)),
(45, 413, CAST('0.987' AS DOUBLE)),
(58, 293, CAST('0.9857' AS DOUBLE)),
(61, 185, CAST('0.9825' AS DOUBLE)),
(70, 447, CAST('0.9891' AS DOUBLE)),
(72, 377, CAST('0.9756' AS DOUBLE)),
(87, 134, CAST('0.9545' AS DOUBLE)),
(92, 450, CAST('0.9583' AS DOUBLE)),
(98, 290, CAST('0.9891' AS DOUBLE)),
(107, 387, CAST('0.9737' AS DOUBLE)),
(120, 332, CAST('0.9714' AS DOUBLE)),
(152, 178, CAST('0.973' AS DOUBLE)),
(166, 323, CAST('0.9833' AS DOUBLE)),
(267, 413, CAST('0.9868' AS DOUBLE)),
(285, 301, CAST('0.9891' AS DOUBLE)),
(295, 374, CAST('0.9667' AS DOUBLE)),
(310, 389, CAST('0.9615' AS DOUBLE)),
(326, 457, CAST('0.9714' AS DOUBLE)),
(393, 420, CAST('0.9873' AS DOUBLE)),
(435, 486, CAST('0.9667' AS DOUBLE)),
(458, 462, CAST('0.9828' AS DOUBLE)))
SELECT CAST(doc_a AS BIGINT) AS doc_a, CAST(doc_b AS BIGINT) AS doc_b, CAST(jaccard AS DOUBLE) AS jaccard FROM t ORDER BY ALL