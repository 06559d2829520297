SELECT kt.kind AS movie_kind, COUNT(*) AS n_titles, MAX(t.episode_nr) AS max_episode
FROM kind_type kt, title t
WHERE kt.id = t.kind_id
GROUP BY kt.kind
ORDER BY n_titles DESC, movie_kind;
