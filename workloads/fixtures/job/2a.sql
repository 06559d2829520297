SELECT MIN(t.title) AS movie_title
FROM company_name cn, keyword k, movie_companies mc, movie_keyword mk, title t
WHERE cn.country_code = '[de]' AND k.keyword = 'character-name-in-title'
  AND cn.id = mc.company_id AND mc.movie_id = t.id AND t.id = mk.movie_id
  AND mk.keyword_id = k.id AND mc.movie_id = mk.movie_id;
