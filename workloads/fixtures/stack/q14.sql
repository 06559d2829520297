SELECT COUNT(*) FROM question as q, answer as a, so_user as u, badge as b
WHERE a.question_id = q.id AND a.site_id = q.site_id
  AND a.owner_user_id = u.id AND u.site_id = a.site_id
  AND b.user_id = u.id AND b.site_id = u.site_id
  AND b.name = 'Scholar' AND q.score >= 5 AND a.score >= 5;
