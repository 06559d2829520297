SELECT cct.kind AS completeness, COUNT(DISTINCT cc.movie_id) AS n_movies
FROM comp_cast_type cct, complete_cast cc
WHERE cct.id = cc.status_id
GROUP BY cct.kind
ORDER BY n_movies DESC, completeness;
