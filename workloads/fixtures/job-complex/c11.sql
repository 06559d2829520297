SELECT lt.link AS link_kind, COUNT(*) AS n_links
FROM link_type lt, movie_link ml, title t
WHERE lt.id = ml.link_type_id AND t.id = ml.movie_id AND t.production_year > 1980
GROUP BY lt.link
ORDER BY n_links DESC, link_kind;
