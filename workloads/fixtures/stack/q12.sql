SELECT COUNT(*) FROM so_user as u, question as q, answer as a
WHERE q.owner_user_id = u.id AND q.site_id = u.site_id
  AND a.question_id = q.id AND a.site_id = q.site_id
  AND u.reputation >= 200 AND u.creation_date <= '2013-01-01 00:00:00'::timestamp
  AND a.score >= 1;
