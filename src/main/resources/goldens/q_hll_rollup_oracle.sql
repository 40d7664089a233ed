WITH sz AS (SELECT count(*) AS n FROM lineitem)
SELECT CAST(c0 AS VARCHAR) AS "level", CAST(c1 AS VARCHAR) AS "key", CAST(c2 AS BIGINT) AS "distinct_approx" FROM (VALUES
('coarse', 'A', 2585),
('coarse', 'B', 2688),
('grp', '0', 741),
('grp', '1', 709),
('grp', '2', 707),
('grp', '3', 729),
('grp', '4', 746),
('grp', '5', 740),
('grp', '6', 687),
('grp', '7', 736)
) AS t(c0, c1, c2)
WHERE (SELECT n FROM sz) < 30000
UNION ALL
SELECT CAST(c0 AS VARCHAR) AS "level", CAST(c1 AS VARCHAR) AS "key", CAST(c2 AS BIGINT) AS "distinct_approx" FROM (VALUES
('coarse', 'A', 22254),
('coarse', 'B', 22468),
('grp', '0', 7053),
('grp', '1', 6899),
('grp', '2', 6873),
('grp', '3', 6899),
('grp', '4', 6869),
('grp', '5', 6873),
('grp', '6', 6879),
('grp', '7', 6968)
) AS t(c0, c1, c2)
WHERE (SELECT n FROM sz) BETWEEN 30000 AND 299999
UNION ALL
SELECT CAST(c0 AS VARCHAR) AS "level", CAST(c1 AS VARCHAR) AS "key", CAST(c2 AS BIGINT) AS "distinct_approx" FROM (VALUES
('coarse', 'A', 49150),
('coarse', 'B', 49229),
('grp', '0', 38022),
('grp', '1', 38763),
('grp', '2', 38699),
('grp', '3', 38538),
('grp', '4', 38481),
('grp', '5', 38145),
('grp', '6', 38580),
('grp', '7', 38366)
) AS t(c0, c1, c2)
WHERE (SELECT n FROM sz) BETWEEN 300000 AND 2999999